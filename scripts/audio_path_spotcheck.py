"""Throughput spot-check for the r12 audio path: WAV + FLAC decode →
Haar spectral fingerprint through the one Arrow-batched mapInPandas
crossing, at growing corpus sizes — the scaling shape that matters is
LINEAR in total samples with per-task parallelism, since each blob is
independent (no shuffle anywhere before the pairing join).

Usage: python3 scripts/audio_path_spotcheck.py [n_blobs ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import pathwaydataframework_spark as pw  # noqa: E402
from pathwaydataframework_spark.operators import flac  # noqa: E402
from pathwaydataframework_spark.operators import multimodal  # noqa: E402
from pathwaydataframework_spark.operators import wavcodec  # noqa: E402


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [256, 1024, 4096]
    n_samples = 8192  # ~1 s at 8 kHz per blob
    spark = pw.get_spark(app_name="audio_spot", cpus="16")
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        # half WAV, half FLAC — the dispatch path under load.  Each
        # blob is DISTINCT seeded-PCG noise so fingerprints rarely
        # collide and the pairing join output stays sparse — the timing
        # measures decode+fingerprint, not a degenerate quadratic join
        # (a periodic base signal rolled/phase-shifted per blob pairs
        # almost everything with everything; so does anything linear
        # in the sample index, e.g. low bits of a multiplicative hash).
        rows = []
        for i in range(n):
            x = np.random.default_rng(i).integers(
                -32768, 32768, n_samples, dtype=np.int32
            )
            blob = (
                wavcodec.encode_pcm16(x)
                if i % 2 == 0
                else flac.encode(x)
            )
            rows.append((i, bytearray(blob)))
        df = spark.createDataFrame(rows, "id long, data binary").repartition(16)
        df = df.localCheckpoint()  # exclude fixture-build from timing
        t0 = time.perf_counter()
        out = multimodal.audio_spectral_pairs(
            df, id_col="id", binary_col="data", max_hamming=3
        )
        n_pairs = out.count()
        dt = time.perf_counter() - t0
        msamp = n * n_samples / 1e6
        print(
            f"n_blobs={n:6d} ({msamp:7.1f} Msamples): {dt:6.2f}s "
            f"({msamp / dt:6.1f} Msamples/s), {n_pairs} near-dup pairs"
        )
    spark.stop()


if __name__ == "__main__":
    main()
