"""OPQ measurement at the scaled embeddings corpus (VERDICT r8 next #5).

The r8 sweep skipped OPQ with a measured reason: at the 500-vector
sf0.01 corpus the ADC shortlist (400) EXCEEDED the scanned mass, so
ADC ranking fidelity — the thing OPQ improves — never cut anything.
The 100x corpus (200k vectors) flips that: scanned mass at
nprobe/k = 24/64 is ~75k candidates per probe, 190x the shortlist,
so ADC fidelity is now the recall bottleneck and OPQ is measurable.

This experiment replays the IVFADC pipeline in numpy (same parameter
shapes as vectors.build_ivf_index / build_ivfpq_codebooks: coarse
k=64 Lloyd on a quarter sample, M=8 x K=16 residual codebooks on a
2000-row sample) and measures recall@10 against exact cosine over a
50-probe panel, for:

  - plain residual PQ (the shipped q_sim_ann_ivfpq path),
  - OPQ-P (parametric OPQ, Ge et al. 2014, CVPR/TPAMI "Optimized
    Product Quantization": rotate the residual space by the
    eigenvectors of its covariance, allocating eigen-directions to
    the M subspaces so the per-subspace variance PRODUCTS balance —
    the closed-form variant; the alternating-minimization variant
    refines it but needs the same infrastructure decision),

at nprobe in {24, 12, 6} (scan fractions 0.375 / 0.1875 / 0.09375)
and shortlist in {400, 100}.

Usage: python tools/experiment_opq.py [sf_dir] [n_probes]
Prints one JSON line with recall per configuration.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

COARSE_K = 64
M, K = 8, 16
CB_SAMPLE, CB_SEED, CB_ITERS = 2000, 11, 8


def lloyd(x: np.ndarray, k: int, iters: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    cents = x[rng.choice(len(x), size=k, replace=False)].copy()
    for _ in range(iters):
        d2 = (x * x).sum(1, keepdims=True) - 2 * x @ cents.T + (cents * cents).sum(1)
        a = d2.argmin(1)
        for j in range(k):
            sel = x[a == j]
            if len(sel):
                cents[j] = sel.mean(0)
    return cents


def opq_p_rotation(res: np.ndarray, m: int) -> np.ndarray:
    """Parametric OPQ: eigen-decompose the residual covariance and
    assign eigenvectors to the m subspaces greedily so the products of
    per-subspace eigenvalues balance (each bucket gets the next
    largest eigenvalue among buckets with the smallest product and
    free capacity). Returns the d x d rotation (columns ordered by
    bucket)."""
    cov = np.cov(res.T)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1]
    w, v = w[order], v[:, order]
    d = res.shape[1]
    cap = d // m
    buckets: list[list[int]] = [[] for _ in range(m)]
    logsum = np.zeros(m)
    for i in range(d):
        free = [b for b in range(m) if len(buckets[b]) < cap]
        b = min(free, key=lambda b: logsum[b])
        buckets[b].append(i)
        logsum[b] += np.log(max(w[i], 1e-12))
    cols = [i for b in buckets for i in b]
    return v[:, cols]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".scale100", "sf10"
    )
    n_probes = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    X = np.vstack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    n, d = X.shape
    rng = np.random.RandomState(42)

    # coarse quantizer: quarter-sample Lloyd, the build_ivf_index shape
    samp = X[rng.choice(n, size=max(n // 4, COARSE_K), replace=False)]
    t0 = time.time()
    C = lloyd(samp, COARSE_K, iters=10, seed=42)
    d2all = (X * X).sum(1, keepdims=True) - 2 * X @ C.T + (C * C).sum(1)
    assign = d2all.argmin(1)
    res = X - C[assign]
    t_coarse = time.time() - t0

    probes = rng.choice(n, size=n_probes, replace=False)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)

    def exact_top10(pi: int) -> set:
        cos = Xn @ Xn[pi]
        cos[pi] = -2
        return set(np.argsort(-cos)[:10].tolist())

    truth = {int(pi): exact_top10(pi) for pi in probes}

    # The scaled corpus is 100 blended copies per source vector, so a
    # probe's exact top-10 are 10 of ~99 near-equal siblings (cos
    # ~0.64 each, margins between ranks 5 and 50 in the 4th decimal).
    # Strict recall@10 therefore measures tie-ordering as much as
    # index quality; CLUSTER recall — did the retrieved item come from
    # the probe's sibling cluster at all — separates retrieval quality
    # from tie noise. Both are reported.
    offset = 10_000_000_000
    vec_ids = np.asarray(t["vec_id"].to_numpy(zero_copy_only=False))
    source = vec_ids % offset

    def fit_books(resid: np.ndarray) -> list[np.ndarray]:
        srng = np.random.RandomState(CB_SEED)
        samp_r = resid[srng.choice(len(resid), size=CB_SAMPLE, replace=False)]
        d_sub = d // M
        return [
            lloyd(samp_r[:, mi * d_sub : (mi + 1) * d_sub], K, CB_ITERS, CB_SEED + mi)
            for mi in range(M)
        ]

    def encode(resid: np.ndarray, books: list[np.ndarray]) -> np.ndarray:
        d_sub = d // M
        codes = np.empty((len(resid), M), dtype=np.int32)
        for mi in range(M):
            sub = resid[:, mi * d_sub : (mi + 1) * d_sub]
            B = books[mi]
            dd = (sub * sub).sum(1, keepdims=True) - 2 * sub @ B.T + (B * B).sum(1)
            codes[:, mi] = dd.argmin(1)
        return codes

    def run(resid: np.ndarray, tag: str, out: dict, R: np.ndarray | None = None) -> None:
        books = fit_books(resid)
        codes = encode(resid, books)
        d_sub = d // M
        for nprobe in (24, 12, 6):
            for shortlist in (400, 100):
                hits = tot = cl_hits = 0
                for pi in probes:
                    pv = X[pi]
                    cd = np.linalg.norm(C - pv, axis=1)
                    cells = np.argsort(cd)[:nprobe]
                    mask = np.isin(assign, cells)
                    cand = np.where(mask)[0]
                    cand = cand[cand != pi]
                    # ADC: LUT per probed CELL (residual vs that cell)
                    adc = np.empty(len(cand))
                    for ci in cells:
                        sel = cand[assign[cand] == ci]
                        if not len(sel):
                            continue
                        rv = pv - C[ci]
                        if R is not None:  # query residual in the rotated space
                            rv = rv @ R
                        lut = np.stack(
                            [
                                (
                                    (
                                        rv[mi * d_sub : (mi + 1) * d_sub]
                                        - books[mi]
                                    )
                                    ** 2
                                ).sum(1)
                                for mi in range(M)
                            ]
                        )  # M x K
                        adc[np.searchsorted(cand, sel)] = lut[
                            np.arange(M)[:, None], codes[sel].T
                        ].sum(0)
                    top = cand[np.argsort(adc)[:shortlist]]
                    cos = Xn[top] @ Xn[pi]
                    rerank = top[np.argsort(-cos)[:10]]
                    hits += len(set(rerank.tolist()) & truth[int(pi)])
                    cl_hits += int((source[rerank] == source[pi]).sum())
                    tot += 10
                out[f"{tag}_np{nprobe}_sl{shortlist}"] = round(hits / tot, 4)
                out[f"{tag}_np{nprobe}_sl{shortlist}_cluster"] = round(
                    cl_hits / tot, 4
                )

    out: dict = {
        "sf_dir": sf_dir,
        "n_vectors": int(n),
        "n_probes": n_probes,
        "coarse_fit_sec": round(t_coarse, 1),
    }
    run(res, "pq", out)
    R = opq_p_rotation(res, M)
    run(res @ R, "opq", out, R=R)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
