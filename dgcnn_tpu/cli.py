"""CLI entry point (reference `bin/dgcnn.py` [M per SURVEY.md §2 #1]):

  python -m dgcnn_tpu train     -io synthetic -i 100 ...
  python -m dgcnn_tpu inference -io h5 -if events.h5 -mp weights/snapshot ...
"""

from __future__ import annotations

import sys

from dgcnn_tpu.config import parse_args


def main(argv=None):
    args = list(sys.argv[1:] if argv is None else argv)
    if args[:1] == ["info"]:
        # diagnostics never require the full flag surface
        from dgcnn_tpu.config import print_info

        return print_info()
    cfg = parse_args(argv)
    try:
        cfg.validate()
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    print(f"dgcnn_tpu {cfg.command} configuration:\n{cfg.summary()}", flush=True)
    # import jax lazily so `--help` never touches the TPU runtime
    from dgcnn_tpu.utils.distributed import maybe_initialize_distributed

    if maybe_initialize_distributed():
        import jax

        print(
            f"multi-host: process {jax.process_index()}/{jax.process_count()}",
            flush=True,
        )
    from dgcnn_tpu.train.loop import inference, train

    if cfg.command == "train":
        train(cfg)
    elif cfg.command == "inference":
        inference(cfg)
    elif cfg.command == "export":
        from dgcnn_tpu.train.export import run_export

        run_export(cfg)
    else:  # pragma: no cover — argparse enforces the choices
        raise SystemExit(f"unknown command {cfg.command!r}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
