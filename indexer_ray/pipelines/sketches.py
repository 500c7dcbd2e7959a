"""Mergeable sketch operators — approximate aggregates whose partial
states combine associatively, the shape that makes them cheap at 100 TB:
each batch reduces to a tiny fixed-size state, the shuffle moves states
(not rows), and a small groupby merges them.

  * hyperloglog_distinct — approximate COUNT(DISTINCT key) per group
    (Flajolet et al. 2007, the published HLL algorithm with the standard
    small-range linear-counting correction).  Standard error ~1.04/sqrt(m).
  * value_histogram / histogram_quantiles — exact equi-width histogram and
    quantiles interpolated from it.
  * heavy_hitters — EXACT counts of all terms above a threshold via a
    two-pass Misra-Gries (1982) candidate prune + broadcast exact verify:
    approximate sketch for pruning, exact answer out.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def _hll_hash64(values) -> np.ndarray:
    """uint64 hash per value.  Integer arrays take a fully vectorized
    path — the splitmix64 finalizer (Steele et al. 2014, public mixing
    constants), three multiply-xor-shift rounds over the whole column at
    once; everything else falls back to per-value blake2b over str()."""
    arr = np.asarray(values)
    if arr.dtype.kind in "iu":
        x = arr.astype(np.uint64)
        with np.errstate(over="ignore"):
            x = x + np.uint64(0x9E3779B97F4A7C15)
            x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            x = x ^ (x >> np.uint64(31))
        return x
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        b = str(v).encode("utf-8")
        out[i] = int.from_bytes(hashlib.blake2b(b, digest_size=8).digest(), "big")
    return out


def _hll_registers(hashes: np.ndarray, p: int) -> np.ndarray:
    """Register array (size m=2^p, uint8) for one batch of hashed values:
    register[j] = max over values routed to j of (leading-zero count of the
    remaining 64-p bits) + 1.  Fully vectorized: the rank comes from the
    bit_length of the suffix (no per-value loop except np.maximum.at)."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if not len(hashes):
        return regs
    j = (hashes >> np.uint64(64 - p)).astype(np.int64)
    suffix = hashes << np.uint64(p)  # remaining bits, left-aligned in 64
    # rank = leading zeros of suffix + 1; suffix==0 -> max rank (64-p+1)
    # leading zeros via log2 on the float mantissa is unsafe at 64-bit;
    # use bit_length: lz = 64 - bit_length(suffix)
    bl = np.zeros(len(suffix), dtype=np.int64)
    s = suffix.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = s >= (np.uint64(1) << np.uint64(shift))
        bl[mask] += shift
        s[mask] >>= np.uint64(shift)
    bl[suffix > 0] += 1  # bit_length of the nonzero values
    rank = np.where(suffix > 0, 64 - bl + 1, 64 - p + 1).astype(np.uint8)
    np.maximum.at(regs, j, rank)
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with the small-range linear-counting
    correction (Flajolet et al. 2007 §4)."""
    m = len(regs)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        return m * np.log(m / zeros)
    return float(est)


def hyperloglog_distinct(ds, key: str, group_col: str | None = None, p: int = 12):
    """Approximate COUNT(DISTINCT `key`) [per `group_col`]:
    one register array per (group, batch) emitted from map_batches, then a
    per-group vectorized register max-merge.  Output:
    (group_col?, approx_distinct) — std error ~1.04/sqrt(2^p) (~1.6% at
    p=12), verified against exact counts in tests.

    The shuffle moves 2^p-byte states per (group, batch) — independent of
    row count; exact distinct counting would shuffle every distinct key."""
    m = 1 << p

    def _null_fill(t: pa.DataType):
        """A valid placeholder value of type `t` for the null-group key row
        (never surfaced: gnull=1 rows reconstruct to None on output)."""
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return ""
        if pa.types.is_binary(t) or pa.types.is_large_binary(t):
            return b""
        if pa.types.is_boolean(t):
            return False
        return 0  # numeric / temporal kinds: 0 casts cleanly

    def _partial(batch: pa.Table) -> pa.Table:
        col = batch.column(key)
        try:
            keys = col.to_numpy(zero_copy_only=False)  # int fast-path
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            keys = col.to_pylist()
        hashes = _hll_hash64(keys)
        regs_out = []
        if group_col is None:
            gk = pa.array([""], type=pa.string())
            gnull = [0]
            regs_out.append(_hll_registers(hashes, p))
        else:
            # Arrow dictionary_encode (not np.unique, not pandas factorize)
            # so the group column keeps its input type EXACTLY — a pandas
            # round-trip would go through float64 when nulls are present
            # and silently round int64 group keys above 2^53 — and null
            # group values group together instead of raising.
            # The groupby key must be NULL-FREE: Ray's map_groups shuffle
            # float64-coerces nullable int keys (collapsing ids > 2^53),
            # so nulls travel as a separate (gnull=1, placeholder) key and
            # are reconstructed to None in the merge stage.
            import pyarrow.compute as pc

            gcol = batch.column(group_col).combine_chunks()
            enc = gcol.dictionary_encode()
            n_uniq = len(enc.dictionary)
            codes = pc.fill_null(enc.indices, n_uniq).to_numpy(zero_copy_only=False)
            has_null = bool(gcol.null_count)
            for c in range(n_uniq + (1 if has_null else 0)):
                regs_out.append(_hll_registers(hashes[codes == c], p))
            gk = enc.dictionary
            gnull = [0] * n_uniq
            if has_null:
                fill = (
                    gk[0].as_py() if n_uniq else _null_fill(gcol.type)
                )
                gk = pa.concat_arrays(
                    [gk, pa.array([fill], type=gcol.type)]
                )
                gnull.append(1)
        return pa.table(
            {
                "gk": gk,
                "gnull": pa.array(gnull, type=pa.int8()),
                "regs": pa.array(
                    [r.tobytes() for r in regs_out], type=pa.binary()
                ),
            }
        )

    def _merge(g: pa.Table) -> pa.Table:
        # Arrow in/out: a pandas group batch would pass nullable-int group
        # keys through float64, collapsing int64 keys above 2^53
        stack = np.stack(
            [
                np.frombuffer(b, dtype=np.uint8, count=m)
                for b in g.column("regs").to_pylist()
            ]
        )
        merged = stack.max(axis=0)
        est = pa.array([int(round(_hll_estimate(merged)))], type=pa.int64())
        if group_col is None:
            return pa.table({"approx_distinct": est})
        gk = g.column("gk")
        garr = (
            pa.nulls(1, type=gk.type)
            if g.column("gnull")[0].as_py()
            else gk.slice(0, 1)
        )
        return pa.table({group_col: garr, "approx_distinct": est})

    return (
        ds.map_batches(_partial, batch_format="pyarrow",
            zero_copy_batch=True, batch_size=8192)
        .groupby(["gk", "gnull"])
        .map_groups(_merge, batch_format="pyarrow")
    )


def value_histogram(ds, col: str, lo: float, width: float, bins: int):
    """Exact equi-width histogram: (bucket, n) with bucket =
    clamp(floor((v - lo)/width), 0, bins-1).  A mergeable aggregate — each
    batch emits at most `bins` partial rows, the groupby sums counts.
    Per-row bucketing is a pure double function, so the DuckDB oracle
    computes bit-identical buckets (no sum-order float hazards: counts are
    integers)."""
    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.clip(np.floor((v - lo) / width).astype(np.int64), 0, bins - 1)
        uniq, counts = np.unique(b, return_counts=True)
        return pa.table(
            {
                "bucket": pa.array(uniq, type=pa.int64()),
                "n": pa.array(counts.astype(np.int64), type=pa.int64()),
            }
        )

    return (
        ds.map_batches(_partial, batch_format="pyarrow",
            zero_copy_batch=True, batch_size=8192)
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"))
    )


def histogram_quantiles(
    ds, col: str, lo: float, width: float, bins: int, qs: list[float]
) -> dict[float, float]:
    """Approximate quantiles from the exact histogram (error <= one bin
    width): linear interpolation within the bucket containing each target
    rank.  Driver sees only `bins` rows."""
    h = value_histogram(ds, col, lo, width, bins).to_pandas().sort_values("bucket")
    counts = np.zeros(bins, dtype=np.int64)
    counts[h["bucket"].to_numpy()] = h["n"].to_numpy()
    total = int(counts.sum())
    cum = np.cumsum(counts)
    out = {}
    for q in qs:
        target = q * total
        b = int(np.searchsorted(cum, target, side="left"))
        b = min(b, bins - 1)
        prev = int(cum[b - 1]) if b else 0
        inside = (target - prev) / max(int(counts[b]), 1)
        out[q] = lo + (b + inside) * width
    return out


_HH_ERR_SENTINEL = "\x00__mg_err__"  # '\x00' never appears in a lexer token


def heavy_hitters(ds, min_count: int, n_counters: int = 4096):
    """Exact global term frequencies for every term with count >= min_count
    — found WITHOUT shuffling the full vocabulary, via a two-pass
    Misra-Gries (1982) candidate prune + exact verify:

      pass 1  map_batches: exact per-batch counts, reduced to a Misra-Gries
              summary of <= n_counters terms (subtract the (n_counters+1)-th
              largest count c* from all, keep positives — a valid MG
              summary with additive error err_b = c* <= n_b/(n_counters+1));
              emits the surviving (term, cnt) rows plus one sentinel row
              carrying err_b.  A groupby-sum merges summaries; summing MG
              states sums their error bounds, so for every term
              true_count - mg_sum <= total_err.
      gate    candidates = terms with mg_sum >= min_count - total_err.
              The completeness guarantee REQUIRES total_err < min_count: a
              term absent from every batch summary has true count <=
              total_err, so only then can no true heavy hitter be missing.
              When total_err >= min_count the sketch cannot certify the
              answer and this function RAISES (no-silent-caps) — size
              n_counters >= ~n_tokens/min_count per batch to avoid it.
      pass 2  broadcast the candidate set (ray.put once, read per batch),
              exact-count ONLY candidates, groupby-sum, filter >= min_count.

    Output: (term, cnt) — exact counts, bit-equal to SQL's
    ``GROUP BY term HAVING count(*) >= min_count`` over plain tokens.
    The full-vocabulary shuffle (|V| rows per batch) is replaced by
    <= n_counters rows per batch in pass 1 and |candidates| in pass 2 —
    the difference between shipping a web-scale vocabulary and a sketch."""
    import ray
    from ray.data.aggregate import Sum

    from indexer_ray.conformance.lexer import tokenize_plain

    def _mg_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        counts: Counter = Counter()
        n_tokens = 0
        for t in batch.column("text").to_pylist():
            toks = tokenize_plain(t or "")
            n_tokens += len(toks)
            counts.update(toks)
        terms = list(counts.keys())
        vals = np.fromiter((counts[t] for t in terms), dtype=np.int64, count=len(terms))
        err = 0
        if len(vals) > n_counters:
            # MG reduction: subtract the (n_counters+1)-th largest, keep > 0
            cstar = int(np.partition(vals, -n_counters - 1)[-n_counters - 1])
            keep = vals > cstar
            terms = [t for t, k in zip(terms, keep) if k]
            vals = vals[keep] - cstar
            err = cstar
        return pa.table(
            {
                "term": pa.array(terms + [_HH_ERR_SENTINEL], type=pa.string()),
                "cnt": pa.array(np.append(vals, err), type=pa.int64()),
            }
        )

    import pyarrow.compute as pc

    # materialized: consumed twice below (err row + candidate gate) — the
    # merged summary itself stays DISTRIBUTED; only the gated candidate
    # set (bounded by ~n_tokens/(min_count - total_err) terms once
    # n_counters is sized ~ n_tokens/min_count) ever reaches the driver
    merged = (
        ds.map_batches(_mg_partial, batch_format="pyarrow",
            zero_copy_batch=True, batch_size=8192)
        .groupby("term")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .materialize()
    )
    total_err = sum(
        r["cnt"]
        for r in merged.map_batches(
            lambda t: t.filter(pc.equal(t.column("term"), _HH_ERR_SENTINEL)),
            batch_format="pyarrow",
        ).take_all()
    )
    if total_err >= min_count:
        # a term can be missing from EVERY batch summary while its true
        # count is as high as total_err — returning would silently drop
        # true heavy hitters (no-silent-caps)
        raise ValueError(
            f"heavy_hitters: accumulated Misra-Gries error {total_err} >= "
            f"min_count {min_count}; the candidate set is not guaranteed "
            f"complete.  Raise n_counters (currently {n_counters}) to at "
            "least ~n_tokens/min_count per batch."
        )
    cand = [
        r["term"]
        for r in merged.map_batches(
            lambda t: t.filter(
                pc.and_(
                    pc.not_equal(t.column("term"), _HH_ERR_SENTINEL),
                    pc.greater_equal(t.column("cnt"), min_count - total_err),
                )
            ),
            batch_format="pyarrow",
        ).take_all()
    ]
    if not cand:
        import ray.data as rd

        return rd.from_arrow(
            pa.table({"term": pa.array([], type=pa.string()),
                      "cnt": pa.array([], type=pa.int64())})
        )
    cand_ref = ray.put(frozenset(cand))

    def _exact_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        cset = ray.get(cand_ref)
        counts: Counter = Counter()
        for t in batch.column("text").to_pylist():
            counts.update(tok for tok in tokenize_plain(t or "") if tok in cset)
        return pa.table(
            {
                "term": pa.array(list(counts.keys()), type=pa.string()),
                "cnt": pa.array(list(counts.values()), type=pa.int64()),
            }
        )

    exact = (
        ds.map_batches(_exact_partial, batch_format="pyarrow",
            zero_copy_batch=True, batch_size=8192)
        .groupby("term")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    import pyarrow.compute as pc

    return exact.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("cnt"), min_count)),
        batch_format="pyarrow",
    )


# ------------------------------------------------------ KLL quantiles


class KLL:
    """KLL quantile sketch (Karnin, Lang & Liberty 2016, FOCS — the
    mergeable streaming quantile sketch): level i holds items of weight
    2^i; a level over capacity sorts and keeps alternate items, promoting
    them one level up.  Deterministic compaction offset (alternating per
    level) instead of coin flips — the known deterministic variant; rank
    error stays O(1/k) with a constant-factor penalty, and results are
    reproducible.

    Why it exists next to `group_quantiles`: the exact operator's shuffle
    is bounded by the VALUE DOMAIN (fine for ints/enums); for continuous
    doubles at 100 TB that rollup degenerates to row count, while a KLL
    state stays O(k log(n/k)) no matter what flows through it."""

    C = 2.0 / 3.0

    def __init__(self, k: int = 200):
        self.k = int(k)
        self.levels: list[list[float]] = [[]]
        self.n = 0
        self._flip: dict[int, int] = {}

    def _cap(self, level: int) -> int:
        h = len(self.levels)
        return max(2, int(np.ceil(self.k * (self.C ** (h - 1 - level)))))

    def add_many(self, values: np.ndarray) -> "KLL":
        self.levels[0].extend(float(v) for v in values)
        self.n += len(values)
        self._compress()
        return self

    def _compress(self) -> None:
        i = 0
        while i < len(self.levels):
            if len(self.levels[i]) > self._cap(i):
                buf = sorted(self.levels[i])
                off = self._flip.get(i, 0)
                self._flip[i] = 1 - off
                promoted = buf[off::2]
                self.levels[i] = []
                if i + 1 == len(self.levels):
                    self.levels.append([])
                self.levels[i + 1].extend(promoted)
            i += 1

    def merge(self, other: "KLL") -> "KLL":
        while len(self.levels) < len(other.levels):
            self.levels.append([])
        for i, lv in enumerate(other.levels):
            self.levels[i].extend(lv)
        self.n += other.n
        self._compress()
        return self

    def quantile(self, q: float) -> float:
        items, weights = [], []
        for i, lv in enumerate(self.levels):
            items.extend(lv)
            weights.extend([1 << i] * len(lv))
        if not items:
            raise ValueError("empty sketch")
        order = np.argsort(np.asarray(items), kind="mergesort")
        vals = np.asarray(items)[order]
        cum = np.cumsum(np.asarray(weights, dtype=np.int64)[order])
        target = q * cum[-1]
        return float(vals[int(np.searchsorted(cum, target))] if target < cum[-1]
                     else vals[-1])

    def to_rows(self) -> tuple[list[int], list[float]]:
        lv = [i for i, l in enumerate(self.levels) for _ in l]
        vals = [v for l in self.levels for v in l]
        return lv, vals

    @classmethod
    def from_rows(cls, levels, values, n: int, k: int = 200) -> "KLL":
        s = cls(k)
        for lv, v in zip(levels, values):
            while len(s.levels) <= lv:
                s.levels.append([])
            s.levels[lv].append(float(v))
        s.n = int(n)
        s._compress()
        return s


def kll_quantiles(
    ds, col: str, quantiles: list[float], k: int = 200, n_parts: int = 16
):
    """Approximate quantiles of a continuous column via distributed KLL:
    per-batch sketches (one fixed-size state per batch), hash-routed
    per-partition merges (n_parts states survive), one driver merge.
    The shuffle moves O(k log n) floats per batch — independent of the
    value domain AND the row count.  Rows-only (sketch; accuracy pinned
    by rank-error tests against exact quantiles).

    Output: one row per requested quantile (q_pct, estimate, n)."""
    import pyarrow.compute as pc  # noqa: F401

    def _batch_sketch(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        s = KLL(k).add_many(v)
        lv, vals = s.to_rows()
        # content-hash routing: deterministic, spreads distinct batches
        part = (
            int.from_bytes(
                hashlib.blake2b(
                    np.asarray(vals, dtype=np.float64).tobytes(), digest_size=8
                ).digest(),
                "big",
            )
            % n_parts
        )
        return pa.table(
            {
                "level": pa.array(lv, type=pa.int32()),
                "value": pa.array(vals, type=pa.float64()),
                "n": pa.array([s.n] + [0] * (len(vals) - 1) if vals else [],
                              type=pa.int64()),
                "part": pa.array([part] * len(vals), type=pa.int32()),
            }
        )

    def _merge_part(g: pd.DataFrame) -> pd.DataFrame:
        s = KLL.from_rows(
            g["level"].to_numpy(), g["value"].to_numpy(),
            int(g["n"].sum()), k,
        )
        lv, vals = s.to_rows()
        return pd.DataFrame(
            {
                "level": np.asarray(lv, dtype=np.int32),
                "value": np.asarray(vals, dtype=np.float64),
                "n": np.asarray([s.n] + [0] * (len(vals) - 1), dtype=np.int64),
            }
        )

    parts = (
        ds.select_columns([col])
        .map_batches(_batch_sketch, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=8192)
        .groupby("part")
        .map_groups(_merge_part, batch_format="pandas")
        .to_pandas()
    )
    if parts.empty:
        return pd.DataFrame({"q_pct": [], "estimate": [], "n": []})
    final = KLL.from_rows(
        parts["level"].to_numpy(), parts["value"].to_numpy(),
        int(parts["n"].sum()), k,
    )
    return pd.DataFrame(
        {
            "q_pct": np.asarray([int(q * 100) for q in quantiles], dtype=np.int64),
            "estimate": [final.quantile(q) for q in quantiles],
            "n": np.asarray([final.n] * len(quantiles), dtype=np.int64),
        }
    )
