"""Worker for tests/test_multihost.py::test_multi_process_inference: one of
two cooperating processes running REAL multi-host data-parallel inference
(jax.distributed over a localhost coordinator, Gloo CPU collectives, the
fused count's cross-host reduction, per-process artifact writes).

Usage: python tests/multihost_infer_worker.py <pid> <port> <img_dir> <ckpt>
       <out_dir> [quant_ckpt]
Prints the fused count line (process 0 only, from predict itself), with
quant_ckpt a third count line from the int8 path (process 0 calibrates,
broadcast_one_to_all ships the scales, every process assembles the same
int8 program), and a final "MHI <pid> ok" sentinel.
"""

import sys

import jax

# the container's sitecustomize force-registers the axon TPU backend and
# overrides jax_platforms; this worker must be CPU (2 virtual devices set
# via XLA_FLAGS by the parent test)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from yogo_tpu.parallel.distributed import initialize_multihost


def main() -> None:
    pid = int(sys.argv[1])
    img_dir, ckpt, out_dir = sys.argv[3], sys.argv[4], sys.argv[5]

    assert initialize_multihost() is True
    assert jax.process_index() == pid

    from yogo_tpu.infer import predict

    # 1) fused on-device count path: forward + NMS + count reduce over the
    #    GLOBAL batch (a cross-host collective); 5 images over 2 processes
    #    at per-process batch 2 -> process 0 runs [0,2)+[2,3) (padded),
    #    process 1 runs [3,5) plus one fully-masked ZERO round (round
    #    alignment for the collective). predict prints on process 0 only.
    predict(
        ckpt,
        path_to_images=img_dir,
        count_predictions=True,
        data_parallel=True,
        batch_size=2,
        obj_thresh=0.3,
        use_tqdm=False,
    )

    # 2) host artifact path: save_preds forces the full-prediction fetch
    #    (fetch_local_rows of the batch-sharded output) and the host count
    #    accumulation + cross-process allgather reduction
    predict(
        ckpt,
        path_to_images=img_dir,
        output_dir=out_dir,
        save_preds=True,
        save_npy=True,  # each rank must write its OWN .p{pid}.npy file
        count_predictions=True,
        data_parallel=True,
        batch_size=2,
        obj_thresh=0.3,
        use_tqdm=False,
    )

    # 3) int8 multi-host: base_model has cin>=128 blocks, so this runs the
    #    REAL cross-host calibration broadcast (process 0's scales via
    #    multihost_utils.broadcast_one_to_all) before the fused count
    if len(sys.argv) > 6:
        predict(
            sys.argv[6],
            path_to_images=img_dir,
            count_predictions=True,
            data_parallel=True,
            quantize=True,
            batch_size=2,
            obj_thresh=0.3,
            use_tqdm=False,
        )

    print(f"MHI {pid} ok", flush=True)


if __name__ == "__main__":
    main()
