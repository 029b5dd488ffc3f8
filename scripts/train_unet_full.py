"""Full U-Net training run (M4) with the round-4 staged options enabled.

Runs train_unet with per-batch shift augmentation and validation-split
model selection (both default-off in the library so the recorded base
numbers stay reproducible), then writes the accuracy evidence — never
the weights — as one JSON line. A full run at n_docs=24 is ~90 min on
this host; launch under nohup and cap BLAS threads via OMP_NUM_THREADS
so concurrent Spark work keeps headroom.

Usage: python scripts/train_unet_full.py [--n-docs 24] [--epochs 60]
           [--val-frac 0.15] [--no-augment] [--out BENCH/UNET_r04.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=24)
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--val-frac", type=float, default=0.15)
    ap.add_argument("--no-augment", action="store_true")
    ap.add_argument("--max-pages-per-doc", type=int, default=None,
                    help="truncate each doc to its first N pages (doc 0 is a "
                         "deliberate 30x long paper; uncapped it dominates "
                         "the training set)")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", default="BENCH/UNET_r04.json")
    ap.add_argument("--save-weights", default=None,
                    help="optional .npz path for the trained parameters")
    args = ap.parse_args()

    from theoremkb_spark.ml.unet import train_unet

    t0 = time.time()
    art = train_unet(
        n_docs=args.n_docs,
        seed=args.seed,
        max_epochs=args.epochs,
        augment=not args.no_augment,
        val_frac=args.val_frac,
        max_pages_per_doc=args.max_pages_per_doc,
        verbose=True,
    )
    wall = time.time() - t0
    if args.save_weights:
        from theoremkb_spark.ml.unet import save_unet

        save_unet(art["model"], args.save_weights)
    row = {k: v for k, v in art.items() if k != "model"}
    row.update(
        n_docs=args.n_docs,
        max_epochs=args.epochs,
        augment=not args.no_augment,
        val_frac=args.val_frac,
        seed=args.seed,
        wall_sec=round(wall, 1),
    )
    Path(args.out).write_text(json.dumps(row, indent=2) + "\n")
    print(json.dumps(row))


if __name__ == "__main__":
    main()
