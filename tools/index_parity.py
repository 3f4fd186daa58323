"""Independent (DuckDB-free) verifier for the nested-index family at scales
where the SQL twin is infeasible — the `semantic_parity.py` / `kcore_parity.py`
pattern applied to the FLAGSHIP `text_index_nested` contract plus its
consumer ops (VERDICT r13 next-round item 2).

Why it exists: the flagship held full rows+schema+hash DuckDB parity at sf10
(500k docs / 25 M tokens), but the twin already cost 54 s there and the
compare protocol collects both engines' full results into Python — ~GBs per
row at the next decade. The ENGINE side is a two-level partial agg whose
output is vocabulary-bound and stays small; only the verification harness
dies. This tool replaces the SQL twin with TWO independent checks:

1. **Python recomputation** of the whole contract from the raw parquet —
   tokenize with the contract's exact rule (lowercase, split on Java's
   ASCII ``\\s+`` class, 0-based ordinals over the RAW split array, empties
   dropped AFTER enumeration), then rebuild every per-term row
   ``(term, postings_json, df)`` with numpy sort/group — no Spark plan, no
   partial aggregation, no to_json codepath. A bug in the two-level agg,
   the posting sort, or the JSON canonicalization shows up as a mismatch.
2. **A collect-free compare protocol**: instead of shipping the engine's
   rows to Python, the engine reduces its OWN output to five scalars
   DISTRIBUTEDLY — row count, sum+bit_xor of a per-row crc32 over the
   canonical row string, sum(df), sum(len(postings_json)) — and the
   verifier computes the same five numbers from its recomputation
   (zlib.crc32 is the same CRC-32 Spark's `crc32` computes, bit-exact).
   This is the verification protocol that survives ANY corpus size: the
   driver-side traffic is five longs, not the index.

The tokenization rule itself is shared by design — it IS the contract
(same caveat semantic_parity documents: independence is in the evaluation
strategy, not in respecifying the op). Self-validate with ``--rows`` at a
gate-green SF (sf0.1, where the registered DuckDB oracle independently
certifies the same rows) before trusting the scalar protocol above it.

Checks: ``text_index_nested`` (rows and/or scalars), ``text_index_flat``
(scalars — corpus-ROW-level, ~75 M rows at sf30: the protocol is not limited
to vocabulary-bound outputs), ``text_index_sharded``, ``text_wordcount``,
``text_doclen`` (scalars), ``text_term_lookup`` + ``text_term_lookup_sharded``
(rows — the consumer contract, df('join')-bounded).

Usage::

    python tools/index_parity.py --sf /root/testdata/sf0.1 --rows   # validate
    python tools/index_parity.py --sf /tmp/spark_graft_sf30         # scale
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# Java regex \s is ASCII-only: [ \t\n\x0B\f\r]. Python's \s would add the
# Unicode whitespace set — replay the engine's class exactly.
_JAVA_WS = re.compile("[ \t\n\x0b\f\r]+")

LOOKUP_TERM = "join"  # text_term_lookup's registered literal


def _tokenize_rowgroups(path: str, lo: int, hi: int):
    """Tokenize row groups [lo, hi) with a LOCAL vocabulary — the unit of
    parallel tokenize work. Local term ids are remapped by the caller."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    vocab: dict[str, int] = {}
    bt: list[int] = []
    bd: list[int] = []
    bp: list[int] = []
    for rg in range(lo, hi):
        tbl = pf.read_row_group(rg, columns=["doc_id", "text"])
        for doc, text in zip(
            tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()
        ):
            for pos, term in enumerate(_JAVA_WS.split(text.lower())):
                if term == "":
                    continue
                tid = vocab.get(term)
                if tid is None:
                    tid = vocab[term] = len(vocab)
                bt.append(tid)
                bd.append(doc)
                bp.append(pos)
    terms_local = [None] * len(vocab)
    for term, tid in vocab.items():
        terms_local[tid] = term
    return (
        terms_local,
        np.array(bt, dtype=np.int64),
        np.array(bd, dtype=np.int64),
        np.array(bp, dtype=np.int64),
    )


def _tok_task(args):
    return _tokenize_rowgroups(*args)


def recompute(sf_dir: str, procs: int = 1):
    """Tokenize the documents table per the contract and return the flat
    (term_id, doc_id, pos) relation sorted by (term, doc, pos), plus the
    id->term vocabulary — everything downstream derives from this.

    ``procs > 1`` fans the per-doc tokenize loop out over row-group slices
    in a SPAWN pool (safe next to a live JVM parent — children never touch
    py4j); per-worker local vocabularies are remapped into one global
    vocabulary on merge. Term-id VALUES differ from the serial path's
    first-occurrence order, which is immaterial: ids are internal, every
    downstream artifact keys on the term STRING, and the scalar
    fingerprints are order-insensitive by construction."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "documents.parquet")
    n_rg = pq.ParquetFile(path).metadata.num_row_groups
    if procs <= 1 or n_rg < 2:
        chunks = [(path, 0, n_rg)]
        results = [_tok_task(c) for c in chunks]
    else:
        import multiprocessing as mp

        n_chunks = min(n_rg, procs * 3)
        step = (n_rg + n_chunks - 1) // n_chunks
        chunks = [
            (path, lo, min(lo + step, n_rg)) for lo in range(0, n_rg, step)
        ]
        with mp.get_context("spawn").Pool(procs) as pool:
            results = pool.map(_tok_task, chunks)

    vocab: dict[str, int] = {}
    t_ids: list[np.ndarray] = []
    d_ids: list[np.ndarray] = []
    p_arr: list[np.ndarray] = []
    for terms_local, tl, dl, pl in results:
        gmap = np.empty(max(len(terms_local), 1), dtype=np.int64)
        for i, term in enumerate(terms_local):
            gid = vocab.get(term)
            if gid is None:
                gid = vocab[term] = len(vocab)
            gmap[i] = gid
        t_ids.append(gmap[tl] if len(terms_local) else tl)
        d_ids.append(dl)
        p_arr.append(pl)
    t = np.concatenate(t_ids)
    d = np.concatenate(d_ids)
    p = np.concatenate(p_arr)
    order = np.lexsort((p, d, t))
    terms = np.empty(len(vocab), dtype=object)
    for term, tid in vocab.items():
        terms[tid] = term
    return t[order], d[order], p[order], terms


def nested_rows(t, d, p, terms):
    """Yield (term, postings_json, df) in the contract's canonical form —
    postings sorted by doc_id, positions sorted, compact JSON byte-identical
    to Spark to_json / DuckDB to_json::VARCHAR (verified by --rows)."""
    term_starts = np.flatnonzero(np.r_[True, t[1:] != t[:-1]])
    term_ends = np.r_[term_starts[1:], len(t)]
    for s, e in zip(term_starts, term_ends):
        dd, pp = d[s:e], p[s:e]
        doc_starts = np.flatnonzero(np.r_[True, dd[1:] != dd[:-1]])
        doc_ends = np.r_[doc_starts[1:], len(dd)]
        postings = [
            {"doc_id": int(dd[a]), "positions": pp[a:b].tolist()}
            for a, b in zip(doc_starts, doc_ends)
        ]
        yield (
            str(terms[t[s]]),
            json.dumps(postings, separators=(",", ":")),
            len(postings),
        )


def flat_rows(t, d, p, terms):
    """Yield (term, doc_id, positions_json, tf) — the corpus-row-level flat
    index. At sf30 this is a ~75 M-row relation; the scalar protocol still
    verifies it with five longs of driver traffic on the engine side."""
    starts = np.flatnonzero(
        np.r_[True, (t[1:] != t[:-1]) | (d[1:] != d[:-1])]
    )
    ends = np.r_[starts[1:], len(t)]
    for a, b in zip(starts, ends):
        yield (
            str(terms[t[a]]),
            int(d[a]),
            json.dumps(p[a:b].tolist(), separators=(",", ":")),
            int(b - a),
        )


N_POSTING_SHARDS = 8  # text_index_sharded's registered constant


def sharded_rows(t, d, p, terms):
    """Yield (term, shard, postings_json, df_shard) — the skew-hardened
    document-sharded index (shard = pmod(doc_id, 8)); within a term slice
    docs ascend, so filtering by shard preserves the postings order."""
    term_starts = np.flatnonzero(np.r_[True, t[1:] != t[:-1]])
    term_ends = np.r_[term_starts[1:], len(t)]
    for s_, e in zip(term_starts, term_ends):
        dd, pp = d[s_:e], p[s_:e]
        doc_starts = np.flatnonzero(np.r_[True, dd[1:] != dd[:-1]])
        doc_ends = np.r_[doc_starts[1:], len(dd)]
        by_shard: dict[int, list] = {}
        for a, b in zip(doc_starts, doc_ends):
            sh = int(dd[a]) % N_POSTING_SHARDS
            if sh < 0:
                sh += N_POSTING_SHARDS
            by_shard.setdefault(sh, []).append(
                {"doc_id": int(dd[a]), "positions": pp[a:b].tolist()}
            )
        for sh in sorted(by_shard):
            yield (
                str(terms[t[s_]]),
                sh,
                json.dumps(by_shard[sh], separators=(",", ":")),
                len(by_shard[sh]),
            )


def _crc(s: str) -> int:
    return zlib.crc32(s.encode("utf-8")) & 0xFFFFFFFF


# All summed fingerprint components are compared in Z/2^64: Spark sums them
# in a (non-ANSI, silently wrapping) LongType, so past ~2^31 rows the JVM
# side wraps while Python stays arbitrary-precision — a spurious FAIL
# (false alarm, never a false pass). Reducing BOTH sides mod 2^64 makes the
# protocol genuinely corpus-size-independent (ADVICE r14 low #1); the xor
# component is width-stable by construction.
_U64 = 1 << 64


def _norm(s: dict[str, int]) -> dict[str, int]:
    for k in ("crc_sum", "aux_sum", "len_sum"):
        s[k] %= _U64
    return s


def _scalars(rows) -> dict[str, int]:
    """The collect-free fingerprint: 5 longs over canonical row strings."""
    n = h_sum = h_xor = aux_sum = len_sum = 0
    for canonical, aux, jlen in rows:
        h = _crc(canonical)
        n += 1
        h_sum += h
        h_xor ^= h
        aux_sum += aux
        len_sum += jlen
    return _norm({
        "rows": n,
        "crc_sum": h_sum,
        "crc_xor": h_xor,
        "aux_sum": aux_sum,
        "len_sum": len_sum,
    })


def _canon_rows(kind: str, t, d, p, terms):
    """Canonical (string, aux, json_len) tuples for one index contract —
    the single place the per-kind row formats live, shared by the serial
    and parallel scalar paths."""
    if kind == "nested":
        for term, pj, df in nested_rows(t, d, p, terms):
            yield (f"{term}\x01{pj}\x01{df}", df, len(pj))
    elif kind == "flat":
        for term, doc, pj, tf in flat_rows(t, d, p, terms):
            yield (f"{term}\x01{doc}\x01{pj}\x01{tf}", tf, len(pj))
    elif kind == "sharded":
        for term, sh, pj, dfs in sharded_rows(t, d, p, terms):
            yield (f"{term}\x01{sh}\x01{pj}\x01{dfs}", dfs, len(pj))
    else:  # pragma: no cover
        raise ValueError(kind)


_W: dict = {}


def _init_scalar_worker(meta, terms):
    """Spawn-pool initializer: attach the parent's shared-memory token
    arrays once per worker (zero-copy views; the 6 GB relation is never
    pickled)."""
    from multiprocessing import shared_memory

    _W["shms"] = []
    arrs = []
    for name, shape, dtype in meta:
        shm = shared_memory.SharedMemory(name=name)
        _W["shms"].append(shm)
        arrs.append(np.ndarray(shape, dtype=dtype, buffer=shm.buf))
    _W["t"], _W["d"], _W["p"] = arrs
    _W["terms"] = np.array(terms, dtype=object)


def _scalar_task(args):
    kind, lo, hi = args
    t, d, p, terms = _W["t"], _W["d"], _W["p"], _W["terms"]
    return _scalars(_canon_rows(kind, t[lo:hi], d[lo:hi], p[lo:hi], terms))


def _merge_scalars(parts):
    out = {"rows": 0, "crc_sum": 0, "crc_xor": 0, "aux_sum": 0, "len_sum": 0}
    for s_ in parts:
        out["rows"] += s_["rows"]
        out["crc_sum"] += s_["crc_sum"]
        out["crc_xor"] ^= s_["crc_xor"]
        out["aux_sum"] += s_["aux_sum"]
        out["len_sum"] += s_["len_sum"]
    return _norm(out)


class ScalarPool:
    """Parallel canonical-build over TERM-ALIGNED chunks of the sorted
    token relation. Arrays live in shared memory; workers are spawned (no
    fork of the JVM parent) and attach zero-copy. The merged five-scalar
    fingerprint is identical to the serial one because every aggregate is
    order-insensitive (sum/xor/count) and chunks cut only at term
    boundaries, so no canonical row is ever split."""

    def __init__(self, t, d, p, terms, procs: int):
        from multiprocessing import shared_memory

        self.procs = procs
        self.t, self.d, self.p, self.terms = t, d, p, terms
        self.pool = None
        self.shms = []
        if procs <= 1:
            return
        import multiprocessing as mp

        meta = []
        for arr in (t, d, p):
            shm = shared_memory.SharedMemory(create=True, size=arr.nbytes)
            np.ndarray(arr.shape, dtype=arr.dtype, buffer=shm.buf)[:] = arr
            self.shms.append(shm)
            meta.append((shm.name, arr.shape, arr.dtype.str))
        self.pool = mp.get_context("spawn").Pool(
            procs, initializer=_init_scalar_worker,
            initargs=(meta, list(terms)),
        )

    def scalars(self, kind: str) -> dict[str, int]:
        if len(self.t) == 0:
            # Empty token relation (empty documents fixture): the row
            # generators' sentinel-True flatnonzero would fabricate a
            # term start at index 0 and IndexError on terms[t[0]] —
            # report the zero fingerprint instead (ADVICE r14 low).
            return _merge_scalars([])
        if self.pool is None:
            return _scalars(
                _canon_rows(kind, self.t, self.d, self.p, self.terms)
            )
        term_starts = np.flatnonzero(
            np.r_[True, self.t[1:] != self.t[:-1]]
        )
        n_chunks = min(len(term_starts), self.procs * 4)
        step = (len(term_starts) + n_chunks - 1) // n_chunks
        bounds = list(term_starts[::step]) + [len(self.t)]
        tasks = [
            (kind, int(lo), int(hi))
            for lo, hi in zip(bounds[:-1], bounds[1:])
        ]
        return _merge_scalars(self.pool.map(_scalar_task, tasks))

    def close(self):
        if self.pool is not None:
            self.pool.terminate()
            self.pool.join()
        for shm in self.shms:
            try:
                shm.close()
                shm.unlink()
            except OSError:
                pass


def spark_scalars(df, cols: list[str], aux_col: str, json_col: str | None):
    """The engine-side reduction of its OWN result to the same 5 longs —
    computed distributedly; the driver receives one row."""
    from pyspark.sql import functions as F

    # concat_ws SKIPS nulls, so a regression that nulls a fingerprinted
    # column would shift fields out of the canonical string instead of
    # producing a distinct marker (ADVICE r14 low): render NULL explicitly.
    # The recomputation side never emits None, so any '<NULL>' in the
    # engine string is itself a guaranteed mismatch.
    canonical = F.concat_ws(
        "\x01",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("<NULL>"))
            for c in cols
        ],
    )
    h = F.crc32(F.encode(canonical, "UTF-8"))
    jlen = (
        F.length(F.col(json_col)) if json_col is not None else F.lit(0)
    )
    r = df.select(
        h.alias("h"),
        F.col(aux_col).cast("long").alias("aux"),
        jlen.cast("long").alias("jl"),
    ).agg(
        F.count("*").alias("rows"),
        F.coalesce(F.sum("h"), F.lit(0)).alias("crc_sum"),
        F.coalesce(F.expr("bit_xor(h)"), F.lit(0)).alias("crc_xor"),
        F.coalesce(F.sum("aux"), F.lit(0)).alias("aux_sum"),
        F.coalesce(F.sum("jl"), F.lit(0)).alias("len_sum"),
    ).collect()[0]
    return _norm({
        "rows": r.rows,
        "crc_sum": r.crc_sum,
        "crc_xor": r.crc_xor,
        "aux_sum": r.aux_sum,
        "len_sum": r.len_sum,
    })


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--rows", action="store_true",
        help="ALSO do the full per-row compare of text_index_nested "
        "(collects the engine result — small-SF self-validation mode)",
    )
    ap.add_argument(
        "--procs", type=int,
        default=max(1, min(16, (os.cpu_count() or 2) - 2)),
        help="parallelism for the tokenize + canonical-build phases "
        "(spawn pool + shared-memory arrays; 1 = the fully serial path "
        "the small-SF self-validation also exercises)",
    )
    args = ap.parse_args()

    from sdu_hadoop_indexer_spark.registry import all_queries
    from sdu_hadoop_indexer_spark.session import get_spark

    QUERIES = all_queries()
    spark = get_spark("index-parity")
    spark.sparkContext.setLogLevel("ERROR")
    failures: list[str] = []

    t0 = time.monotonic()
    t, d, p, terms = recompute(args.sf, procs=args.procs)
    print(
        f"# recompute: {len(t)} tokens, {len(terms)} terms, "
        f"{time.monotonic() - t0:.1f}s (procs={args.procs})",
        flush=True,
    )
    pool = ScalarPool(t, d, p, terms, args.procs)

    # --- text_index_nested: the flagship -------------------------------
    t0 = time.monotonic()
    expected = pool.scalars("nested")
    t_np = time.monotonic() - t0
    t0 = time.monotonic()
    got = spark_scalars(
        QUERIES["text_index_nested"](spark, args.sf),
        ["term", "postings", "df"],
        "df",
        "postings",
    )
    t_eng = time.monotonic() - t0
    ok = got == expected
    print(
        f"text_index_nested scalars: {'PASS' if ok else 'FAIL'} "
        f"rows={got['rows']} engine={t_eng:.1f}s numpy={t_np:.1f}s"
    )
    if not ok:
        failures.append(f"text_index_nested scalars: {expected} != {got}")

    if args.rows:
        eng = {
            r.term: (r.postings, r.df)
            for r in QUERIES["text_index_nested"](spark, args.sf).collect()
        }
        ref = {
            term: (pj, df) for term, pj, df in nested_rows(t, d, p, terms)
        }
        diff = {
            k
            for k in set(eng) | set(ref)
            if eng.get(k) != ref.get(k)
        }
        print(
            f"text_index_nested rows: {'PASS' if not diff else 'FAIL'} "
            f"({len(ref)} terms)"
        )
        if diff:
            k = sorted(diff)[0]
            failures.append(
                f"text_index_nested rows: {len(diff)} differ; first "
                f"{k!r}: engine={eng.get(k)!r} recompute={ref.get(k)!r}"
            )

    # --- text_index_incremental: merge path, same final relation --------
    # (base+delta merge must equal the from-scratch index — the registered
    # oracle's own rule; expected scalars are the nested check's, reused.)
    t0 = time.monotonic()
    got = spark_scalars(
        QUERIES["text_index_incremental"](spark, args.sf),
        ["term", "postings", "df"],
        "df",
        "postings",
    )
    ok = got == expected
    print(
        f"text_index_incremental scalars: {'PASS' if ok else 'FAIL'} "
        f"rows={got['rows']} engine={time.monotonic() - t0:.1f}s"
    )
    if not ok:
        failures.append(
            f"text_index_incremental scalars: {expected} != {got}"
        )

    # --- text_wordcount: vocabulary-bound scalar check ------------------
    cnt = np.bincount(t, minlength=len(terms))
    expected = _scalars(
        (f"{terms[i]}\x01{int(cnt[i])}", int(cnt[i]), 0)
        for i in range(len(terms))
    )
    got = spark_scalars(
        QUERIES["text_wordcount"](spark, args.sf),
        ["term", "cnt"],
        "cnt",
        None,
    )
    ok = got == expected
    print(f"text_wordcount scalars: {'PASS' if ok else 'FAIL'} rows={got['rows']}")
    if not ok:
        failures.append(f"text_wordcount scalars: {expected} != {got}")

    # --- text_index_flat: corpus-ROW-level check (75 M rows at sf30) ----
    t0 = time.monotonic()
    expected = pool.scalars("flat")
    t_np = time.monotonic() - t0
    t0 = time.monotonic()
    got = spark_scalars(
        QUERIES["text_index_flat"](spark, args.sf),
        ["term", "doc_id", "positions", "tf"],
        "tf",
        "positions",
    )
    t_eng = time.monotonic() - t0
    ok = got == expected
    print(
        f"text_index_flat scalars: {'PASS' if ok else 'FAIL'} "
        f"rows={got['rows']} engine={t_eng:.1f}s numpy={t_np:.1f}s"
    )
    if not ok:
        failures.append(f"text_index_flat scalars: {expected} != {got}")

    # --- text_index_sharded: the skew-hardened variant -------------------
    expected = pool.scalars("sharded")
    got = spark_scalars(
        QUERIES["text_index_sharded"](spark, args.sf),
        ["term", "shard", "postings", "df_shard"],
        "df_shard",
        "postings",
    )
    ok = got == expected
    print(f"text_index_sharded scalars: {'PASS' if ok else 'FAIL'} rows={got['rows']}")
    if not ok:
        failures.append(f"text_index_sharded scalars: {expected} != {got}")

    # --- text_doclen: corpus-sized output, still 5 longs of traffic -----
    docs, dl = np.unique(d, return_counts=True)
    expected = _scalars(
        (f"{int(docs[i])}\x01{int(dl[i])}", int(dl[i]), 0)
        for i in range(len(docs))
    )
    got = spark_scalars(
        QUERIES["text_doclen"](spark, args.sf), ["doc_id", "dl"], "dl", None
    )
    ok = got == expected
    print(f"text_doclen scalars: {'PASS' if ok else 'FAIL'} rows={got['rows']}")
    if not ok:
        failures.append(f"text_doclen scalars: {expected} != {got}")

    # --- term lookup (+ sharded scatter-gather): consumer contract ------
    join_rows = {}
    tid = {str(terms[i]): i for i in range(len(terms))}.get(LOOKUP_TERM)
    if tid is not None:
        s, e = np.searchsorted(t, [tid, tid + 1])
        dd, pp = d[s:e], p[s:e]
        doc_starts = np.flatnonzero(np.r_[True, dd[1:] != dd[:-1]])
        doc_ends = np.r_[doc_starts[1:], len(dd)]
        join_rows = {
            int(dd[a]): (
                json.dumps(pp[a:b].tolist(), separators=(",", ":")),
                int(b - a),
            )
            for a, b in zip(doc_starts, doc_ends)
        }
    for op in ("text_term_lookup", "text_term_lookup_sharded"):
        eng = {
            r.doc_id: (r.positions, r.tf)
            for r in QUERIES[op](spark, args.sf).collect()
        }
        ok = eng == join_rows
        print(f"{op} rows: {'PASS' if ok else 'FAIL'} ({len(eng)} docs)")
        if not ok:
            ks = sorted(
                k
                for k in set(eng) | set(join_rows)
                if eng.get(k) != join_rows.get(k)
            )
            failures.append(
                f"{op}: {len(ks)} docs differ; first {ks[0]}: "
                f"engine={eng.get(ks[0])!r} recompute={join_rows.get(ks[0])!r}"
            )

    pool.close()
    if failures:
        print("FAIL:")
        for f in failures:
            print("  " + f[:500])
        return 1
    print("PASS: engine == independent recomputation on every check")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
