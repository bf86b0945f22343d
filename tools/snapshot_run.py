#!/usr/bin/env python
"""Snapshot a finished run's recoverable core into artifacts/ (git-tracked).

The round-5 VM restart wiped `saved/` (every checkpoint and metric vector
that had not been committed).  This tool copies the small, non-regenerable
parts of a run dir — metric vectors (*.npy), summaries/configs/logs (json,
jsonl, txt), and checkpoints up to a size cap — into an artifacts/
subdirectory so a plain `git add artifacts/<dest>` preserves the evidence.
WAV outputs are regenerable from checkpoint + corpus and stay behind
.gitignore.

Usage: python tools/snapshot_run.py saved/<name>/<run>/ artifacts/round5/<leg>
       [--ckpt-cap-mb 80]
"""

import argparse
import os
import shutil


KEEP_EXT = {".npy", ".json", ".jsonl", ".txt", ".log", ".md"}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("src")
    ap.add_argument("dest")
    ap.add_argument("--ckpt-cap-mb", type=float, default=80.0,
                    help="copy model_best/checkpoint_current up to this size")
    args = ap.parse_args()

    cap = args.ckpt_cap_mb * 1e6
    copied, skipped = [], []
    for root, _dirs, files in os.walk(args.src):
        rel = os.path.relpath(root, args.src)
        for f in sorted(files):
            src = os.path.join(root, f)
            ext = os.path.splitext(f)[1]
            is_ckpt = f in ("model_best.ckpt", "checkpoint_current.ckpt",
                            "best.pth", "last.pth")
            if ext in KEEP_EXT or (is_ckpt and os.path.getsize(src) <= cap):
                dst = os.path.join(args.dest, rel, f)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                shutil.copy2(src, dst)
                copied.append(os.path.join(rel, f))
            else:
                skipped.append(os.path.join(rel, f))
    print(f"copied {len(copied)} files -> {args.dest} "
          f"(skipped {len(skipped)}: wavs/rotating ckpts)")
    for c in copied:
        print("  +", c)


if __name__ == "__main__":
    main()
