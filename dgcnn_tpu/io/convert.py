"""Offline dataset converter / generator.

Replaces the reference's dependency on the larcv C++/ROOT event IO [H per
SURVEY.md §2.1]: detector dumps (CSV) are converted once into the
canonical offsets layout (h5/npz) that the training hot path reads, and a
synthetic generator produces benchmark/smoke datasets.

Usage:
  python -m dgcnn_tpu.io.convert csv2h5  in.csv out.h5
  python -m dgcnn_tpu.io.convert csv2npz in.csv out.npz
  python -m dgcnn_tpu.io.convert convert in.h5 out.dgb   # any -> any
  python -m dgcnn_tpu.io.convert synth   out.h5 --events 128 --points 4096
"""

from __future__ import annotations

import argparse

from dgcnn_tpu.io.readers import CSVIO
from dgcnn_tpu.io.synthetic import SyntheticIO, write_canonical


def write_any(path: str, events):
    """Write events in the format implied by the extension (h5/npz/dgb)."""
    if path.endswith(".dgb"):
        from dgcnn_tpu.io.dgb import write_dgb

        write_dgb(path, events)
    elif path.endswith(".npz"):
        write_canonical(path, events, "npz")
    else:
        write_canonical(path, events, "h5")


def read_any(path: str, data_key="data", label_key="label", weight_key=""):
    """Reader chosen by extension (csv/h5/npz/dgb); returns event list.

    Dispatch is shared with the training path (`readers.reader_for`) so
    converter and trainer can never disagree about a format."""
    from dgcnn_tpu.io.readers import kind_of_path, reader_for

    io = reader_for(kind_of_path(path), path, data_key, label_key, weight_key)
    io.initialize()
    events = [io.read_event(i) for i in range(io.num_events())]
    io.finalize()
    return events


def main(argv=None):
    p = argparse.ArgumentParser(prog="dgcnn_tpu.io.convert", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    for name in ("csv2h5", "csv2npz", "csv2dgb", "convert"):
        c = sub.add_parser(
            name,
            help="any->any by extension" if name == "convert" else None,
        )
        c.add_argument("input")
        c.add_argument("output")
        if name == "convert":
            c.add_argument("--data_key", default="data")
            c.add_argument("--label_key", default="label")
            # canonical weight column name; silently absent if the input
            # has no weights (readers guard on key presence)
            c.add_argument("--weight_key", default="weight")
    s = sub.add_parser("synth")
    s.add_argument("output")
    s.add_argument("--events", type=int, default=128)
    s.add_argument("--points", type=int, default=4096)
    s.add_argument("--classes", type=int, default=2)
    s.add_argument("--seed", type=int, default=0)
    s.add_argument("--weights", action="store_true")
    s.add_argument("--fixed_length", action="store_true")
    ns = p.parse_args(argv)

    if ns.cmd.startswith("csv2"):
        io = CSVIO(ns.input).initialize()
        events = [io.read_event(i) for i in range(io.num_events())]
        write_any(ns.output, events)
        print(f"wrote {len(events)} events -> {ns.output}")
    elif ns.cmd == "convert":
        events = read_any(ns.input, ns.data_key, ns.label_key, ns.weight_key)
        write_any(ns.output, events)
        print(f"wrote {len(events)} events -> {ns.output}")
    else:
        io = SyntheticIO(
            num_events=ns.events,
            num_point=ns.points,
            num_class=ns.classes,
            seed=ns.seed,
            variable_length=not ns.fixed_length,
            with_weights=ns.weights,
        ).initialize()
        events = [io.read_event(i) for i in range(io.num_events())]
        write_any(ns.output, events)
        total = sum(len(e) for e in events)
        print(f"wrote {len(events)} events ({total} points) -> {ns.output}")


if __name__ == "__main__":
    main()
