"""CLI dispatcher: `yogo {train,test,export,infer,serve}`
(reference: yogo/__main__.py:7-44 - no mp start-method needed: JAX is
single-controller; subcommand modules import lazily)."""

import sys

from yogo_tpu.utils.argparsers import global_parser


def apply_device_override(device) -> None:
    """Honor --device as a JAX platform override. The env var alone is a
    no-op here: importing argparsers already imported jax (via the package
    init), and environments like the axon dev harness override
    JAX_PLATFORMS from sitecustomize anyway - jax.config.update after
    import is the mechanism that actually works (same as tests/conftest.py;
    backends are not yet initialized at this point)."""
    if not device:
        return
    import os

    import jax

    os.environ["JAX_PLATFORMS"] = device  # for any subprocesses
    jax.config.update("jax_platforms", device)


def main() -> None:
    p = global_parser()
    args = p.parse_args()
    apply_device_override(getattr(args, "device", None))

    if args.task == "train":
        from yogo_tpu.train import do_training

        do_training(args)
    elif args.task == "test":
        from yogo_tpu.utils.test_model import do_model_test

        do_model_test(args)
    elif args.task == "export":
        from yogo_tpu.utils.export_model import do_export

        try:
            do_export(args)
        except ImportError as e:
            print(f"export dependencies missing: {e}")
            sys.exit(1)
    elif args.task == "infer":
        from yogo_tpu.infer import do_infer

        do_infer(args)
    elif args.task == "serve":
        from yogo_tpu.serve import do_serve

        do_serve(args)
    else:
        p.print_help()


if __name__ == "__main__":
    main()
