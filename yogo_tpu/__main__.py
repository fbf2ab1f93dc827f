"""CLI dispatcher: `yogo {train,test,export,infer}`
(reference: yogo/__main__.py:7-44 - no mp start-method needed: JAX is
single-controller; subcommand modules import lazily)."""

import sys

from yogo_tpu.utils.argparsers import global_parser


def main() -> None:
    p = global_parser()
    args = p.parse_args()

    # honor --device as a JAX platform override before any jax import
    device = getattr(args, "device", None)
    if device:
        import os

        os.environ["JAX_PLATFORMS"] = device

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
    else:
        p.print_help()


if __name__ == "__main__":
    main()
