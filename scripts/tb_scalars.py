"""Dump TensorBoard scalars from a run dir — the read side of the
telemetry the training CLIs write (train/logging.py; taxonomy matches
the reference's train/src/logging.rs:280-376).

Usage:
    python scripts/tb_scalars.py RUN_DIR               # last value per tag
    python scripts/tb_scalars.py RUN_DIR TAG [TAG...]  # full series, CSV
    python scripts/tb_scalars.py RUN_DIR --json        # last values, JSON

RUN_DIR is a logging.dir run directory (the one holding the
events.out.tfevents.* file) or any parent — the newest event file found
under it is read.  Mid-run reads are fine (the event file is append-only);
this is the quickest way to watch loss/* and benchmark/* panels converge
without a TensorBoard server.
"""

import glob
import json
import os
import sys


def _find_event_file(path: str) -> str:
    if os.path.isfile(path):
        return path
    hits = glob.glob(os.path.join(path, "**", "events.out.tfevents.*"),
                     recursive=True)
    if not hits:
        raise SystemExit(f"no event files under {path}")
    return max(hits, key=os.path.getmtime)


def load_scalars(path: str):
    """tag -> list of (step, value), in file order."""
    from tensorboard.backend.event_processing import event_accumulator

    acc = event_accumulator.EventAccumulator(
        _find_event_file(path),
        size_guidance={event_accumulator.SCALARS: 0})  # 0 = keep all
    acc.Reload()
    return {tag: [(e.step, e.value) for e in acc.Scalars(tag)]
            for tag in acc.Tags()["scalars"]}


def main(argv):
    if not argv:
        raise SystemExit(__doc__)
    as_json = "--json" in argv
    argv = [a for a in argv if a != "--json"]
    run_dir, tags = argv[0], argv[1:]
    scalars = load_scalars(run_dir)
    if tags:
        missing = [t for t in tags if t not in scalars]
        if missing:
            raise SystemExit(f"unknown tags {missing}; "
                             f"available: {sorted(scalars)}")
        print("step," + ",".join(tags))
        steps = sorted({s for t in tags for s, _ in scalars[t]})
        series = {t: dict(scalars[t]) for t in tags}
        for s in steps:
            row = [f"{series[t][s]:.6g}" if s in series[t] else ""
                   for t in tags]
            print(f"{s}," + ",".join(row))
    elif as_json:
        print(json.dumps({t: {"step": v[-1][0], "value": v[-1][1]}
                          for t, v in scalars.items() if v}, indent=2))
    else:
        width = max(len(t) for t in scalars) if scalars else 0
        for t in sorted(scalars):
            if scalars[t]:
                s, v = scalars[t][-1]
                print(f"{t:<{width}}  step {s:>7}  {v:.6g}")


if __name__ == "__main__":
    main(sys.argv[1:])
