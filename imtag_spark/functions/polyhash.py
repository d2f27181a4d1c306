"""Closed-form integer hash primitives expressible in ANY ANSI-SQL engine.

The generic dedup/ANN operators key their randomness off ``xxhash64`` and
NumPy RNG streams — ideal at scale (single JVM hash call), but impossible
for an external SQL oracle to reproduce. These primitives trade one JVM
hash call for a short arithmetic expression over ``ascii``/``substring``/
``%`` that evaluates bit-identically in Spark SQL and DuckDB (all values
stay below 2^62, so 64-bit integer arithmetic never overflows — safe under
Spark's ANSI mode), making the *full* MinHash/SimHash/LSH pipelines
oracle-checkable end to end.

Everything is modulo the Mersenne prime M31 = 2^31 - 1; multipliers are
Knuth-style odd constants. The SQL *fragments* are generated here once and
used verbatim by both engines, so there is no dual-implementation drift.
"""

from __future__ import annotations

import numpy as np

M31 = 2_147_483_647  # 2^31 - 1 (Mersenne prime)
_BASE = 131  # polynomial base; > any byte, classic Rabin-Karp choice
_KNUTH = 2_654_435_761  # 2^32 * golden ratio, the Knuth multiplicative mix


def shingle_hash_sql(text_expr: str, pos_expr: str, k: int) -> str:
    """SQL fragment: polynomial hash of the k-char shingle at 1-based
    ``pos_expr`` within ``text_expr``: fold h = (h*131 + codepoint) % M31.

    Every intermediate < M31*131 + 0x10FFFF < 2^39. Characters past the end
    of the string hash as codepoint 0 (``ascii('') = 0`` in both engines).
    """
    # seed as BIGINT: DuckDB's ascii() is INT32 and would overflow the fold
    h = f"CAST(ascii(substring({text_expr}, {pos_expr}, 1)) AS BIGINT)"
    for i in range(1, k):
        h = (
            f"(({h}) * {_BASE} + "
            f"ascii(substring({text_expr}, {pos_expr} + {i}, 1))) % {M31}"
        )
    return h


def token_weight_sql(pos_expr: str) -> str:
    """SQL fragment: position weight w(i) = ((i+1) * KNUTH) % M31 for the
    order-dependent token hash (sum of per-char terms, see token hashing in
    ``operators/dedup.simhash_signatures_sql``)."""
    return f"((({pos_expr}) + 1) * {_KNUTH}) % {M31}"


def minhash_coeffs(num_hashes: int) -> tuple[list[int], list[int]]:
    """(a_j, b_j) for the j-th permutation h -> (a*h + b) % M31.

    Plain integer arithmetic — no RNG — so an external oracle regenerates
    the exact constants from j alone. a_j is forced odd and nonzero.
    """
    a = [(2 * ((j * _KNUTH + 1_234_567) % ((M31 - 1) // 2)) + 1) for j in range(num_hashes)]
    b = [((j * 907_633_385 + 28_411) % M31) for j in range(num_hashes)]
    return a, b


def band_weights(rows_per_band: int) -> list[int]:
    """Per-row weights for the order-independent band bucket hash
    bh = (sum_r (sig_r * w_r) % M31) % M31."""
    return [((r * 11 + 3) * _KNUTH) % M31 for r in range(rows_per_band)]


def id_mix_sql(id_expr: str) -> str:
    """SQL fragment: Knuth mix of an integer id into [0, M31) — the
    deterministic uniform sampling key (IVF centroid pick)."""
    return f"((({id_expr}) % {M31}) * {_KNUTH}) % {M31}"


def deterministic_planes(n_planes: int, dim: int) -> np.ndarray:
    """Integer 'random' hyperplanes for sign-LSH, w in [-1000, 1000]:
    w(p, d) = ((p*73856093 + d*19349663 + 83492791) % 2001) - 1000.

    Scale is irrelevant for the sign test; direction diversity is what
    matters, and the two large primes decorrelate rows. Reproducible in SQL
    with one modulo — no Gaussian sampling."""
    p = np.arange(n_planes, dtype=np.int64)[:, None]
    d = np.arange(dim, dtype=np.int64)[None, :]
    return (((p * 73_856_093 + d * 19_349_663 + 83_492_791) % 2001) - 1000).astype(
        np.float64
    )


def label_color_sql(label_expr: str) -> str:
    """SQL fragment: 24-bit Knuth color mix for the S7 RGBA label dimension
    (reference ``to_rgba_label_image`` seeded-rand analog). Shared verbatim
    by the Spark operator (``label_image.label_color_dim``) and the DuckDB
    oracle — labels are positive (dense, base >= 1), so ``%`` agrees across
    engines and the product stays < 2^56 (ANSI-safe)."""
    return f"((({label_expr}) % 16777216) * {_KNUTH}) % 16777216"


def plane_weight_sql(plane_expr: str, dim_expr: str) -> str:
    """SQL fragment matching :func:`deterministic_planes` elementwise."""
    return (
        f"((CAST(({plane_expr}) AS BIGINT) * 73856093"
        f" + CAST(({dim_expr}) AS BIGINT) * 19349663 + 83492791)"
        " % 2001) - 1000"
    )
