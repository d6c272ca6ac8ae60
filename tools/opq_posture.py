#!/usr/bin/env python
"""Measure OPQ-lite rotation (operators.similarity.opq_rotation,
rotate=True through the IVFADC stack) across corpus REGIMES — the
posture table ANN.md carries (round-12 measured the real corpus; this
round adds the planted-ANISOTROPIC regimes the explained-variance
dashboard predicts rotation wins on, verdict r12 task 5).

For each corpus the tool reports, unrotated vs rotated (n_cells=8,
n_probe=4, m=4, 16 codes — the r12 settings):

- residual explained-variance top-2 ratios (the DASHBOARD: run
  pca_explained on the residuals; rotate when the top ratios clear
  ~3-4x the uniform 1/64),
- total quantization error (sum of pq_encode's per-subspace dist),
- ADC recall@5 vs exact cosine over 50 queries,
- shortlist-20 containment of the exact top-5.

Corpora:

- real          — the sf embeddings as-is (r12's regime: mildly
                  anisotropic residuals, modest win).
- spike         — planted clusters + a strong 1-D component along the
                  all-ones direction, which STRADDLES every PQ subspace:
                  unrotated, each independent codebook re-quantizes its
                  share of the same scalar; rotated, PCA puts the
                  component on one axis in one subspace.  The textbook
                  PCA-rotation win.
- scaled        — planted clusters + per-dim noise scaling interleaved
                  so every subspace mixes high- and low-variance dims
                  (s_j = 2.0 if j % 4 == 0 else 0.1) — the
                  axis-aligned-anisotropy regime, where PCA is ~a
                  permutation; reported honestly either way.

Usage: python tools/opq_posture.py  (prints the markdown rows; the
narrative integrates them into ANN.md)
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_CELLS, N_PROBE, M, K_CODES, K, N_Q = 8, 4, 4, 16, 5, 50


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import functions as F

    from localsql_spark.operators import cleanup
    from localsql_spark.operators import similarity as S
    from localsql_spark.session import get_spark
    from localsql_spark.workload import load

    spark = get_spark(app_name="opq_posture")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load(spark, sf_dir)["embeddings"]

    c = (F.col("vec_id") % 16).cast("int")

    def planted(extra):
        return emb.select(
            "vec_id",
            F.transform(
                "embedding",
                lambda x, i: F.when(i == c, F.lit(10.0)).otherwise(F.lit(0.0))
                + extra(x, i)).alias("embedding")) \
            .localCheckpoint(eager=True)

    # deterministic per-row scalar in [-1, 1] for the spike component
    c_i = ((F.col("vec_id") * 37 % 21) - 10) / 10.0
    corpora = {
        "real": emb.select("vec_id", F.transform(
            "embedding", lambda x: x.cast("double")).alias("embedding"))
        .localCheckpoint(eager=True),
        "spike": planted(lambda x, i: x.cast("double") * 0.05
                         + c_i * F.lit(2.0 / 8.0)),
        "scaled": planted(
            lambda x, i: x.cast("double") * 0.05
            * F.when(i % 4 == 0, F.lit(40.0)).otherwise(F.lit(2.0))),
    }

    for name, corpus in corpora.items():
        queries = corpus.filter(F.col("vec_id") < N_Q)
        truth = {}
        for r in S.knn_brute_force(corpus, queries, k=K).collect():
            truth.setdefault(r.query_id, set()).add(r.neighbor_id)

        # dashboard: residual explained-variance top-2 ratios
        cents = S._coarse_cells(corpus, N_CELLS, "vec_id", "embedding")
        assign = S._coarse_assign(corpus, cents, "vec_id", "embedding")
        res = assign.select("vec_id", F.col("resid").alias("embedding")) \
            .localCheckpoint(eager=True)
        cov, _ = S.covariance_and_means_arrow(res)
        ratios = sorted((r.ratio for r in
                         S.pca_explained(cov, rounds=6).collect()),
                        reverse=True)
        print(f"# {name}: residual top-2 explained ratios "
              f"{ratios[0]:.3f} / {ratios[1]:.3f} (uniform 1/64 = 0.0156)",
              file=sys.stderr)

        row = {"ratios": (ratios[0], ratios[1])}
        for rotate in (False, True):
            t0 = time.perf_counter()
            r2 = res
            if rotate:
                rot = S.opq_rotation(res, "embedding", balance_m=M)
                r2 = S._rotate_frame(res, "vec_id", "embedding", rot) \
                    .localCheckpoint(eager=True)
            books = S.pq_train(r2.filter(F.col("vec_id") >= N_CELLS),
                               M, K_CODES, 1)
            qerr = (S.pq_encode(r2, books, M)
                    .agg(F.sum("dist")).first()[0])
            # end-to-end: ADC top-20 shortlist + recall@5
            short = {}
            for r in S.knn_ivfpq_adc(corpus, queries, k=20,
                                     n_cells=N_CELLS, n_probe=N_PROBE,
                                     m=M, k_codes=K_CODES,
                                     exclude_self=True,
                                     rotate=rotate).collect():
                short.setdefault(r.query_id, set()).add(r.neighbor_id)
            contain = sum(len(short.get(q, set()) & t) / len(t)
                          for q, t in truth.items()) / len(truth)
            got5 = {}
            for r in S.knn_ivfpq_adc(corpus, queries, k=K,
                                     n_cells=N_CELLS, n_probe=N_PROBE,
                                     m=M, k_codes=K_CODES,
                                     exclude_self=True,
                                     rotate=rotate).collect():
                got5.setdefault(r.query_id, set()).add(r.neighbor_id)
            recall = sum(len(got5.get(q, set()) & t) / len(t)
                         for q, t in truth.items()) / len(truth)
            wall = time.perf_counter() - t0
            row["rot" if rotate else "raw"] = (qerr, recall, contain)
            print(f"# {name} rotate={rotate}: qerr={qerr:.1f} "
                  f"recall@5={recall:.3f} contain@20={contain:.3f} "
                  f"({wall:.1f}s)", file=sys.stderr)
            cleanup()
        qe_raw, rc_raw, ct_raw = row["raw"]
        qe_rot, rc_rot, ct_rot = row["rot"]
        d = (qe_rot - qe_raw) / qe_raw * 100
        print(f"| {name} | {row['ratios'][0]:.3f} / {row['ratios'][1]:.3f} "
              f"| {qe_raw:.1f} | {qe_rot:.1f} ({d:+.0f}%) "
              f"| {rc_raw:.3f} | {rc_rot:.3f} "
              f"| {ct_raw:.3f} | {ct_rot:.3f} |")


if __name__ == "__main__":
    main()
