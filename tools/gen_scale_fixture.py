"""Synthesize a `documents.parquet` at an arbitrary scale for SLOPE studies.

The driver's fixtures stop at sf0.1 (5 000 docs) and are read-only, and its
generator is not shipped — so scale-slope claims ("linear at 10×") need a
local extrapolation. This generator mimics the fixture documents table's
observable distributions (token vocabulary harvested from the real sf0.1
fixture, ~40-60 tokens/doc, 5 langs, 20 sources, an exact-duplicate clone
rate and a near-duplicate mutation rate for the dedup family) with a fixed
seed, writing `<out>/documents.parquet`.

IMPORTANT: slope numbers must compare runs of THIS generator at two sizes
(e.g. --docs 5000 vs --docs 50000), never a generated corpus against the
driver fixture — the duplicate structure differs in detail, and only the
within-generator ratio isolates the algorithmic slope.

Usage::

    python tools/gen_scale_fixture.py --docs 50000 --out /tmp/slope_sf1
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

EXACT_DUP_RATE = 0.06  # fraction of docs that are verbatim clones
NEAR_DUP_RATE = 0.05  # fraction that are 1-2-token mutations of another doc


def harvest_vocab(fixture: str) -> list[str]:
    import duckdb

    rows = duckdb.sql(
        "SELECT DISTINCT unnest(string_split(text, ' ')) AS t FROM "
        f"read_parquet('{fixture}/documents.parquet') ORDER BY t"
    ).fetchall()
    return [r[0] for r in rows if r[0]]


def synth_vocab(n_terms: int) -> list[str]:
    """Open synthetic vocabulary (``w00000``…): the harvested fixture vocab
    is only ~31 terms, so random 40-60-token docs over it are ALL
    near-identical — true near-dup structure Θ(n²) by construction, which
    measures output growth, not the algorithm (the round-5 LSH slope row's
    diagnosis). The exact-join family's slope claim is about the PREFIX
    FILTER, so it needs a corpus where true near-dups are the injected
    clones/mutations only — i.e. a vocabulary wide enough that random docs
    share few tokens."""
    return [f"w{i:05d}" for i in range(n_terms)]


def generate(
    n_docs: int, out: str, fixture: str, seed: int = 42, vocab_terms: int = 0
) -> str:
    rng = np.random.default_rng(seed)
    vocab = np.array(
        synth_vocab(vocab_terms) if vocab_terms else harvest_vocab(fixture)
    )
    # Zipf-ish token popularity like the fixture's (a few hot terms)
    weights = 1.0 / np.arange(1, len(vocab) + 1)
    weights /= weights.sum()
    order = rng.permutation(len(vocab))
    vocab = vocab[order]

    texts: list[str] = []
    n_base = int(n_docs * (1 - EXACT_DUP_RATE - NEAR_DUP_RATE))
    lengths = rng.integers(40, 61, size=n_base)
    for ln in lengths:
        toks = rng.choice(vocab, size=ln, p=weights)
        texts.append(" ".join(toks))
    while len(texts) < n_docs * (1 - NEAR_DUP_RATE):  # exact clones
        texts.append(texts[int(rng.integers(0, n_base))])
    while len(texts) < n_docs:  # near-dups: mutate 1-2 tokens
        src = texts[int(rng.integers(0, n_base))].split(" ")
        for _ in range(int(rng.integers(1, 3))):
            src[int(rng.integers(0, len(src)))] = str(
                rng.choice(vocab)
            )
        texts.append(" ".join(src))

    perm = rng.permutation(n_docs)
    texts = [texts[i] for i in perm]
    langs = rng.choice(
        np.array(["en", "fr", "es", "de", "zh"]), size=n_docs,
        p=[0.5, 0.15, 0.15, 0.1, 0.1],
    )
    sources = np.array([f"src{i}" for i in rng.integers(0, 20, size=n_docs)])
    table = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    os.makedirs(out, exist_ok=True)
    path = os.path.join(out, "documents.parquet")
    pq.write_table(table, path)
    return path


EMB_DUP_RATE = 0.05  # fraction of vectors that are near-clones (cos ≥ ~0.99)
EMB_DIM = 64
EMB_LABELS = 8


def generate_embeddings(n_vecs: int, out: str, seed: int = 43) -> str:
    """Synthesize an `embeddings.parquet` matching the driver fixture's
    schema (vec_id int64, embedding list<float>, label int32) for the
    ANN/embedding-dedup slope rows: base vectors are unit-normalized
    Gaussians (the fixture's near-random regime), plus an injected
    EMB_DUP_RATE of near-clones (tiny perturbation, cosine ≥ ~0.99) so the
    ANN dedup family has a true duplicate set whose size scales linearly —
    the candidate/edge growth the banding-linearity claim is about."""
    rng = np.random.default_rng(seed)
    n_base = int(n_vecs * (1 - EMB_DUP_RATE))
    base = rng.standard_normal((n_base, EMB_DIM))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    src = rng.integers(0, n_base, size=n_vecs - n_base)
    clones = base[src] + 0.02 * rng.standard_normal(
        (n_vecs - n_base, EMB_DIM)
    )
    clones /= np.linalg.norm(clones, axis=1, keepdims=True)
    vecs = np.vstack([base, clones])[rng.permutation(n_vecs)].astype(
        np.float32
    )
    table = pa.table(
        {
            "vec_id": pa.array(range(n_vecs), pa.int64()),
            "embedding": pa.array(
                [v for v in vecs.tolist()], pa.list_(pa.float32())
            ),
            "label": pa.array(
                rng.integers(0, EMB_LABELS, size=n_vecs).tolist(), pa.int32()
            ),
        }
    )
    os.makedirs(out, exist_ok=True)
    path = os.path.join(out, "embeddings.parquet")
    pq.write_table(table, path)
    return path


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--fixture", default="/root/testdata/sf0.1")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument(
        "--synth-vocab", type=int, default=0,
        help="use an open synthetic vocabulary of N terms instead of "
        "harvesting the fixture's (~31-term) one — required for exact-join "
        "slope studies where true near-dups must stay sparse",
    )
    args = ap.parse_args()
    path = generate(args.docs, args.out, args.fixture, args.seed, args.synth_vocab)
    print(path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
