"""Product quantization (PQ) for approximate nearest-neighbor search.

The classic ANN compression (Jégou et al., "Product Quantization for
Nearest Neighbor Search", TPAMI 2011 — public literature, see PAPERS.md):
split each vector into M subvectors, quantize each against its own
K-codeword codebook, and score candidates from the reconstructed
(quantized) vectors — M·log2(K) bits per vector instead of dim doubles
(here 8 subspaces × 16 codewords = 4 bytes per 64-dim vector, a 128×
compression of the scan side).

Spark shapes:
- code assignment is ROW-LOCAL (M argmin expressions over K codeword
  distances — same plan class as the IVF cell argmax): map-only, scales
  linearly, and the tiny code table is what a 100 TB scan reads;
- search reconstructs candidates from codes (pure literal lookups) and
  ranks by cosine against the exact query vector — the asymmetric-distance
  (ADC) formulation, a single scan + per-query top-k;
- codebooks here are deterministic LCG seeds so the DuckDB oracle can
  inline them (production PQ trains per-subspace k-means — the
  ``ivf.kmeans_train`` machinery applies per subspace unchanged; the
  index mechanics this module implements are identical either way).

Every expression renders for both dialects and folds left-to-right, so
Spark and the oracle agree bit-for-bit.
"""

from __future__ import annotations

from engine_spark.datapipe import fragments as FR
from engine_spark.datapipe.fragments import Dialect

PQ_M = 8    #: subspaces
PQ_K = 16   #: codewords per subspace (4-bit codes)
PQ_SUB = 8  #: dims per subspace (PQ_M * PQ_SUB = embedding dim)


def _codebooks() -> list[list[list[float]]]:
    g = FR._lcg(424_2026)
    return [
        [
            [(next(g) % 2_000_001) / 1_000_000.0 - 1.0 for _ in range(PQ_SUB)]
            for _ in range(PQ_K)
        ]
        for _ in range(PQ_M)
    ]


CODEBOOKS = _codebooks()


def _arr(d: Dialect, vals: list[float]) -> str:
    # CAST per literal: bare numerics parse as DECIMAL in both engines, and
    # an all-literal vector (the reconstruction) would then do decimal
    # arithmetic — overflowing DECIMAL(38) in DuckDB's fold
    lits = ", ".join(f"CAST({x!r} AS DOUBLE)" for x in vals)
    return f"array({lits})" if d.spark else f"[{lits}]"


def l2sq_chain(d: Dialect, a: str, b: str) -> str:
    """Σ (a_i - b_i)² as a strict left fold (bit-identical both engines)."""
    if d.spark:
        return (
            f"aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
            f"cast(0.0 as double), (acc, v) -> acc + v)"
        )
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}), "
        f"z -> (z[1] - z[2]) * (z[1] - z[2])), (acc, v) -> acc + v)"
    )


def pq_code(d: Dialect, vec: str, m: int) -> str:
    """1-based code of subspace ``m``: argmin over the K codewords of the
    L2² distance to the subvector; first minimum wins in both engines."""
    sub = d.slice_k(vec, str(m * PQ_SUB + 1), PQ_SUB)
    dists = [f"({l2sq_chain(d, sub, _arr(d, cw))})" for cw in CODEBOOKS[m]]
    if d.spark:
        lst = f"array({', '.join(dists)})"
        return f"CAST(array_position({lst}, array_min({lst})) AS INT)"
    lst = f"[{', '.join(dists)}]"
    return f"CAST(list_position({lst}, list_min({lst})) AS INT)"


def pq_recon(d: Dialect, code_cols: list[str]) -> str:
    """Reconstructed vector: concatenation of each subspace's codeword
    selected by its (already-staged) code column."""
    parts = []
    for m, col in enumerate(code_cols):
        book = (
            "array(" + ", ".join(_arr(d, cw) for cw in CODEBOOKS[m]) + ")"
            if d.spark
            else "[" + ", ".join(_arr(d, cw) for cw in CODEBOOKS[m]) + "]"
        )
        parts.append(
            f"element_at({book}, {col})" if d.spark else f"{book}[{col}]"
        )
    if d.spark:
        return "concat(" + ", ".join(parts) + ")"
    return " || ".join(parts)
