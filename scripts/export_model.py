"""Export a trained run to a self-contained AOT serving artifact.

    python scripts/export_model.py -c outputs/<name> -o model.stablehlo \
        [--batch-size 1] [--sequence-length 17] [--platforms tpu,cpu]

The artifact holds the full rollout forward lowered to StableHLO with the
best checkpoint's weights baked in — serve it with
`dlwpbench_tpu.utils.export.load_exported` (no model code needed).
Replaces the reference's unpickle-into-model-class restore
(`evaluate.py:140-149`) for deployment.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--run-dir", required=True)
    p.add_argument("-o", "--out", required=True)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--sequence-length", type=int, default=None)
    p.add_argument(
        "--platforms", default=None,
        help="comma-separated lowering platforms, e.g. 'tpu,cpu' "
        "(default: current backend)",
    )
    a = p.parse_args(argv)

    from dlwpbench_tpu.utils.export import export_from_run_dir

    platforms = a.platforms.split(",") if a.platforms else None
    path = export_from_run_dir(
        a.run_dir, a.out,
        batch_size=a.batch_size,
        sequence_length=a.sequence_length,
        platforms=platforms,
    )
    print(f"exported {a.run_dir} -> {path} ({os.path.getsize(path)} bytes)")


if __name__ == "__main__":
    main()
