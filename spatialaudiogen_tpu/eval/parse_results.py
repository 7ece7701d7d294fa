"""Aggregate eval-detailed.txt into headline numbers.

Parity with reference parse_eval_results.py:9-51: per-video averages with
the paper's rescalings — MSE as sqrt(mse*4800) (RMS over the 0.1 s window at
48 kHz), ENV/EMD as sqrt(x^2*4800), STFT raw mean.
"""

from __future__ import annotations

import numpy as np

SAMPLES_PER_SEC = 4800
HEADLINE = [("MSE ", "mse/avg"), ("STFT", "stft/avg"),
            ("ENV ", "env_mse/avg"), ("EMD ", "emd/dir")]


def parse_eval_detailed_file(fn: str):
    data = open(fn).read().splitlines()
    metrics = data[0].split(" | ")[1].split()
    sample_time: dict = {}
    sample_vals: dict = {}
    for line in data[1:]:
        head, vals = line.split(" | ")
        yid, t = head.split()
        sample_time.setdefault(yid, []).append(float(t))
        sample_vals.setdefault(yid, []).append([float(v) for v in vals.split()])
    for yid in sample_time:
        order = np.argsort(sample_time[yid])
        sample_time[yid] = np.asarray(sample_time[yid])[order]
        sample_vals[yid] = np.asarray(sample_vals[yid])[order]
    return sample_vals, sample_time, metrics


def aggregate(fn: str) -> dict:
    vals, _, keys = parse_eval_detailed_file(fn)
    out = {}
    for label, mt in HEADLINE:
        idx = keys.index(mt)
        if mt in ("emd/dir", "env_mse/avg"):
            per_video = [np.sqrt(vals[y][:, idx] ** 2 * SAMPLES_PER_SEC).mean() for y in vals]
        elif mt == "mse/avg":
            per_video = [np.sqrt(vals[y][:, idx] * SAMPLES_PER_SEC).mean() for y in vals]
        else:
            per_video = [vals[y][:, idx].mean() for y in vals]
        out[label.strip()] = float(np.mean(per_video))
    return out


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("eval_detailed_fn")
    args = parser.parse_args(argv)
    for label, value in aggregate(args.eval_detailed_fn).items():
        print(f"{label} = {value:.3f}")


if __name__ == "__main__":
    main()
