#!/usr/bin/env python
"""Standalone metric evaluation over a results directory.

Parity: reference evaluate_results.py:14-86 — PESQ-wb/nb + SI-SNR + STOI over
target/condition/output WAV triplets, per-file vectors saved, noisy-vs-output
averages printed.  ``--load`` summarizes previously saved vectors
(loadResults :44-58, without the matplotlib display).
"""

import argparse
import logging

from sddm_tpu.evaluate import evaluate, load_results

if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO, format="%(message)s")
    parser = argparse.ArgumentParser(description="Evaluate enhancement results")
    parser.add_argument("samples_path", type=str,
                        help="dir containing target/ condition/ output/")
    parser.add_argument("--sample_rate", type=int, default=16000)
    parser.add_argument("--metrics", nargs="+",
                        default=["pesq_wb", "stoi", "sisnr"])
    parser.add_argument("--load", action="store_true",
                        help="summarize previously saved metric vectors")
    parser.add_argument("--plot", action="store_true",
                        help="with --load: save best-improvement waveform "
                        "figures (reference loadResults shows these)")
    args = parser.parse_args()

    logger = logging.getLogger("evaluate")
    if args.load:
        summary = load_results(args.samples_path, args.metrics,
                               plot=args.plot, sample_rate=args.sample_rate)
        for m, vals in summary.items():
            logger.info("%s: %s", m, vals)
    else:
        evaluate(args.samples_path, ".wav", args.sample_rate,
                 set(args.metrics), logger)
