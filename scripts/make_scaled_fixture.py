#!/usr/bin/env python3
"""Synthesize a k×-scaled BENCH fixture from an existing testdata dir.

Usage: python3 scripts/make_scaled_fixture.py SRC_DIR OUT_DIR K
           [--dim D] [--clusters C] [--sigma S]

Purpose (r5 verdict ask #6): all bench evidence was a single scale
factor; a super-linear query (LSH pair explosion, window skew) is
invisible at one sf. This produces "same distribution, k× the rows"
fixtures so the headliners can be run at two+ scale factors and the
slope recorded (SCALE.md). BENCH-ONLY: correctness oracles stay on the
driver-generated /root/testdata dirs.

Scaling model (TPC-H convention — dims fixed, facts scale):

- region / nation: copied unchanged.
- customer / supplier / part / orders / lineitem / events: k copies,
  every entity key offset by copy_idx * 10**7 so referential
  integrity holds per copy and group counts scale k×. Dates/timestamps
  unchanged: the time range is constant, density scales — which is how
  a growing production table actually behaves.
- documents: k copies with doc_id offset AND every token suffixed with
  the copy index ("_<i>", copy 0 unchanged). Plain replication would
  make each document an exact/near duplicate of its k-1 twins, so
  near-dup pair volume would grow k² and dedup slopes would measure an
  artifact of the generator, not the operator. Disjoint per-copy
  shingle spaces keep the WITHIN-copy duplicate structure bit-identical
  → pairs scale k×, the honest "more of the same data" curve.
- embeddings: k copies with vec_id offset and the vector circularly
  rotated by copy_idx dims (norms and within-copy geometry preserved,
  cross-copy cosine decorrelated — same reasoning as documents).

High-dimension mode (r12 verdict ask #2 — every embedding measurement
ran at the fixture's dim 64; real corpora are 768-4096-dim and the
inline-vs-checkpoint cosine trade plausibly flips there): `--dim D`
(D a multiple of the source dim) EXPANDS each embedding to D dims by
tiling ``D/dim`` blocks, block b the source vector circularly rotated
by ``b*5 mod dim`` (block 0 unrotated). Rotations are orthogonal and
IDENTICAL across vectors, so for any pair <u', v'> = (D/dim)·<u, v>
and ‖u'‖ = √(D/dim)·‖u‖ — every pairwise COSINE is preserved
EXACTLY. The high-dim fixture therefore has bit-identical candidate
and pair structure to its dim-64 twin; only the per-dimension
arithmetic scales, which is precisely the axis the A/B isolates.

Clustered-geometry mode (r13 verdict ask #1 — the standard fixture's
embeddings have NEAR-UNIFORM pairwise cosines, so "true top-k
neighbors" sit barely above the bulk and every recall axis built on
them (q221 ann recall, q236 hard-negative recall) reads noise-floor
numbers that cannot validate a bits/multiprobe deployment rule):
`--clusters C [--sigma S]` REPLACES the embedding values with planted
Gaussian cluster structure, the geometry real embedding corpora have
(that is why embeddings exist):

- C unit-norm cluster centers (seeded Gaussian); vector for vec_id
  belongs to cluster ``vec_id % C`` and is
  ``normalize(center + S * unit_noise(vec_id))`` — S is the
  noise-to-signal NORM ratio, so within-cluster cosine concentrates
  near 1/(1+S²) (default S=0.78 → ≈0.62 ± ~0.10 at dim 64) while
  cross-cluster cosine stays near 0 ± 1/√dim: true nearest
  neighbors are unambiguous and well above the bulk.
- every 10th vector (vec_id % 10 == 9) is a TWIN of its predecessor
  (predecessor's base vector + 0.25·unit_noise, cosine ≈ 0.97), so
  near-dup EXCLUSION machinery (q236's shared clusters) has real
  work to do at a dup_threshold of ~0.9 — between the twin band
  (~0.97) and the cluster band (~0.62).
- per-vector noise is keyed on vec_id alone (deterministic,
  row-order-independent); k-copies get distinct vectors via their
  offset ids, no rotation needed.
- composes with ``--dim``: clusters are planted at the SOURCE dim
  and expanded by the same cosine-preserving tiled rotation, so the
  d64 and d768 clustered fixtures have IDENTICAL pair geometry.

Deterministic throughout (fixed seeds, value a pure function of
vec_id). DuckDB does the table work; ~seconds at sf0.1.
"""

from __future__ import annotations

import os
import sys

import duckdb

KEY_OFFSET = 10**7

# table -> columns to offset per copy
OFFSET_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_UNCHANGED = ["region", "nation"]


def copy_select(table: str, src: str, i: int) -> str:
    cols = duckdb.connect().execute(
        f"DESCRIBE SELECT * FROM read_parquet('{src}/{table}.parquet')"
    ).fetchall()
    exprs = []
    for name, _typ, *_ in cols:
        if name in OFFSET_COLS.get(table, []):
            exprs.append(f"{name} + {i * KEY_OFFSET} AS {name}")
        elif table == "documents" and name == "text" and i > 0:
            exprs.append(
                f"regexp_replace(text, '(\\S+)', '\\1_{i}', 'g') AS text"
            )
        elif table == "embeddings" and name == "embedding" and i > 0:
            # Rotate by i MOD dim: DuckDB slice clamping makes
            # embedding[i+1:] empty for i >= dim, which would silently
            # degrade to the identity and re-introduce the k² exact-dup
            # pair artifact this rotation exists to avoid (ADVICE r6).
            dim = duckdb.connect().execute(
                f"SELECT len(embedding) FROM "
                f"read_parquet('{src}/{table}.parquet') LIMIT 1"
            ).fetchone()[0]
            r = i % dim
            assert r > 0, (
                f"copy {i} rotates by 0 (dim={dim}): an exact duplicate "
                "of copy 0 — use k < dim copies or add a second "
                "decorrelation axis"
            )
            exprs.append(
                f"(embedding[{r + 1}:] || embedding[:{r}])::FLOAT[] "
                "AS embedding"
            )
        else:
            exprs.append(name)
    return (
        f"SELECT {', '.join(exprs)} "
        f"FROM read_parquet('{src}/{table}.parquet')"
    )


def expand_dim_sql(src_dim: int, target_dim: int) -> str:
    """Tiled-rotation expansion expression (cosine-preserving; see
    module docstring). ``b*5 mod dim`` with dim 64 gives 12 distinct
    block rotations up to D=768 and stays distinct through D=4096."""
    assert target_dim % src_dim == 0, (target_dim, src_dim)
    blocks = []
    for b in range(target_dim // src_dim):
        r = (b * 5) % src_dim
        if r == 0:
            blocks.append("embedding")
        else:
            blocks.append(f"(embedding[{r + 1}:] || embedding[:{r}])")
    return f"flatten([{', '.join(blocks)}])::FLOAT[] AS embedding"


TWIN_EVERY = 10  # vec_id % 10 == 9 -> near-dup twin of vec_id - 1
TWIN_SIGMA = 0.25  # twin noise ratio -> twin cosine ~= 0.97
CLUSTER_SEED = 9001


def clustered_embeddings_table(con, src: str, k: int, n_clusters: int,
                               sigma: float):
    """(vec_id, embedding, label) pyarrow table with planted-cluster
    vectors (module docstring) — ids/labels from the k-copied offset
    union, values a pure function of vec_id."""
    import numpy as np
    import pyarrow as pa

    src_dim = con.execute(
        f"SELECT len(embedding) FROM "
        f"read_parquet('{src}/embeddings.parquet') LIMIT 1"
    ).fetchone()[0]
    ids_labels = con.execute(
        " UNION ALL ".join(
            f"SELECT vec_id + {i * KEY_OFFSET} AS vec_id, label "
            f"FROM read_parquet('{src}/embeddings.parquet')"
            for i in range(k)
        )
        + " ORDER BY vec_id"
    ).fetchall()
    rs = np.random.RandomState(CLUSTER_SEED)
    centers = rs.randn(n_clusters, src_dim)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)

    def unit_noise(vid: int, salt: int):
        g = np.random.RandomState(
            (vid * 2654435761 + CLUSTER_SEED + salt) % (2**31 - 1)
        ).randn(src_dim)
        return g / np.linalg.norm(g)

    def base_vec(vid: int):
        v = centers[vid % n_clusters] + sigma * unit_noise(vid, 0)
        return v / np.linalg.norm(v)

    vecs = []
    for vid, _label in ids_labels:
        # KEY_OFFSET is a multiple of TWIN_EVERY, so twin-ness is
        # copy-invariant and a twin's predecessor always exists
        if vid % TWIN_EVERY == TWIN_EVERY - 1:
            v = base_vec(vid - 1) + TWIN_SIGMA * unit_noise(vid, 1)
            v = v / np.linalg.norm(v)
        else:
            v = base_vec(vid)
        vecs.append([float(x) for x in v])
    return pa.table({
        "vec_id": pa.array([r[0] for r in ids_labels], pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array([r[1] for r in ids_labels]),
    })


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    src, out, k = args[0], args[1], int(args[2])
    target_dim = None
    if "--dim" in sys.argv:
        target_dim = int(sys.argv[sys.argv.index("--dim") + 1])
    n_clusters = None
    if "--clusters" in sys.argv:
        n_clusters = int(sys.argv[sys.argv.index("--clusters") + 1])
    sigma = 0.78
    if "--sigma" in sys.argv:
        sigma = float(sys.argv[sys.argv.index("--sigma") + 1])
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for table in COPY_UNCHANGED:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{table}.parquet')) "
            f"TO '{out}/{table}.parquet' (FORMAT PARQUET)"
        )
        print(f"{table}: copied")
    for table in OFFSET_COLS:
        if table == "embeddings" and n_clusters is not None:
            emb_py = clustered_embeddings_table(con, src, k, n_clusters,
                                                sigma)
            con.register("emb_py", emb_py)
            union = "SELECT vec_id, embedding::FLOAT[] AS embedding, " \
                    "label FROM emb_py"
        else:
            union = " UNION ALL ".join(
                copy_select(table, src, i) for i in range(k)
            )
        if table == "embeddings" and target_dim is not None:
            src_dim = con.execute(
                f"SELECT len(embedding) FROM "
                f"read_parquet('{src}/{table}.parquet') LIMIT 1"
            ).fetchone()[0]
            union = (
                f"SELECT vec_id, {expand_dim_sql(src_dim, target_dim)}, "
                f"label FROM ({union})"
            )
        con.execute(
            f"COPY ({union}) TO '{out}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{out}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {n} rows ({k} copies)")
    if target_dim is not None:
        d = con.execute(
            f"SELECT max(len(embedding)) FROM "
            f"read_parquet('{out}/embeddings.parquet')"
        ).fetchone()[0]
        print(f"embeddings dim: {d}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
