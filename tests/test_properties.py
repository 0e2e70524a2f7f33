"""Property-based tests (hypothesis) for the pure kernels: sketch merge
laws, CSV dynamic-typing decisions, rule-kernel masks vs brute force.
No Ray needed — these are the per-batch building blocks."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

SET = dict(deadline=None, max_examples=30)


@settings(**SET)
@given(
    a=st.lists(st.integers(0, 10_000), min_size=0, max_size=500),
    b=st.lists(st.integers(0, 10_000), min_size=0, max_size=500),
)
def test_hll_merge_equals_add_all(a, b):
    from seronet_data_validator_ray.sketches import HyperLogLog

    h1 = HyperLogLog(p=12).add_array(np.array(a, dtype=np.int64))
    h2 = HyperLogLog(p=12).add_array(np.array(b, dtype=np.int64))
    merged = h1.merge(h2)
    both = HyperLogLog(p=12).add_array(np.array(a + b, dtype=np.int64))
    assert merged.estimate() == both.estimate()
    true = len(set(a) | set(b))
    if true >= 10:
        assert abs(merged.estimate() - true) / true < 0.15


@settings(**SET)
@given(
    a=st.lists(st.floats(-1e6, 1e6), min_size=1, max_size=400),
    b=st.lists(st.floats(-1e6, 1e6), min_size=1, max_size=400),
    q=st.floats(0.01, 0.99),
)
def test_tdigest_quantile_bounds(a, b, q):
    from seronet_data_validator_ray.sketches import TDigest

    td = TDigest().add_array(np.array(a))
    td.merge(TDigest().add_array(np.array(b)))
    allv = np.sort(np.array(a + b))
    est = td.quantile(q)
    # estimate must lie within the data range and within a loose rank window
    assert allv[0] <= est <= allv[-1]
    # est's plausible rank interval (ties make a point-rank ill-defined)
    rank_lo = np.searchsorted(allv, est, side="left") / len(allv)
    rank_hi = np.searchsorted(allv, est, side="right") / len(allv)
    assert rank_lo - 0.25 <= q <= rank_hi + 0.25


@settings(**SET)
@given(
    vals=st.lists(st.integers(-100, 4200), min_size=0, max_size=300),
    lo=st.integers(0, 10),
    hi=st.integers(100, 4096),
)
def test_k_range_matches_bruteforce(vals, lo, hi):
    from seronet_data_validator_ray.rules.kernels import evaluate_kernel

    tbl = pa.table({"n_tok": pa.array(vals, type=pa.int32())})
    mask, _ = evaluate_kernel(tbl, "range", "n_tok", {"lo": lo, "hi": hi}, {})
    want = np.array([v < lo or v > hi for v in vals], dtype=bool)
    assert (np.asarray(mask) == want).all()


_INTS = st.integers(-10**6, 10**6).map(str)
_FLOATS = st.floats(-1e6, 1e6, allow_nan=False).map(lambda f: f"{f:.4f}")
_DATES = st.dates().map(lambda d: d.isoformat())
_WORDS = st.text(alphabet="abcdefgh", min_size=1, max_size=8)


@settings(**SET)
@given(
    kind=st.sampled_from(["int", "float", "date", "word"]),
    n=st.integers(1, 30),
    blanks=st.integers(0, 5),
    data=st.data(),
)
def test_csv_type_decision_properties(kind, n, blanks, data):
    from seronet_data_validator_ray.sources.csv_source import (
        cast_batch,
        decide_types,
        type_verdict_batch,
    )

    strat = {"int": _INTS, "float": _FLOATS, "date": _DATES, "word": _WORDS}[kind]
    vals = [data.draw(strat) for _ in range(n)] + [""] * blanks
    tbl = pa.table({"c": pa.array(vals, type=pa.string())})
    decided = decide_types(type_verdict_batch(tbl))
    out = cast_batch(tbl, decided)["c"]
    if kind == "int":
        assert decided["c"] == pa.int64()
        assert out.null_count == blanks
    elif kind == "float":
        assert decided["c"] in (pa.float64(), pa.int64())  # "3.0000" w/o dot impossible; ok
    elif kind == "date":
        assert pa.types.is_timestamp(decided["c"])
    else:
        # words: stays string unless every word accidentally matches a number
        assert decided["c"] == pa.string()
    # splitting the column into two batches must reach the same decision
    half = len(vals) // 2
    t1 = pa.table({"c": pa.array(vals[:half], type=pa.string())})
    t2 = pa.table({"c": pa.array(vals[half:], type=pa.string())})
    v = pa.concat_tables([type_verdict_batch(t1), type_verdict_batch(t2)])
    assert decide_types(v) == decided


@settings(**SET)
@given(
    groups=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.lists(st.integers(0, 999), min_size=1, max_size=50)),
        min_size=1,
        max_size=40,
    )
)
def test_stats_histogram_matches_numpy(groups):
    from seronet_data_validator_ray.stages.stats import PartialStats, StatsSpec

    spec = StatsSpec(list_col="tokens", group_col="source", list_hist=(0, 1000, 16),
                     len_hist=(1, 64, 8))
    tbl = pa.table(
        {
            "source": pa.array([g for g, _ in groups], type=pa.string()),
            "tokens": pa.array([t for _, t in groups], type=pa.list_(pa.int32())),
        }
    )
    ps = PartialStats(spec).update(tbl)
    for src in {g for g, _ in groups}:
        toks = np.concatenate([t for g, t in groups if g == src]).astype(np.int64)
        want = np.bincount(np.clip(toks * 16 // 1000, 0, 15), minlength=16)
        got = ps.group_list_hist[src].counts
        assert (got == want).all(), (src, got, want)


@settings(**SET)
@given(
    docs=st.lists(
        st.lists(st.integers(0, 3000), min_size=1, max_size=120),
        min_size=2,
        max_size=25,
    )
)
def test_pair_verify_matches_bruteforce(docs):
    """The packed-binary vectorized Jaccard verifier (_toks_to_binary +
    _jaccard_of_pairs) vs naive set math over every (i<j) pair — exercises
    ragged rows, empty intersections and the lexsort dedup-count path."""
    import numpy as np

    from seronet_data_validator_ray.functions import dedup

    toks = [np.array(sorted(set(d)), dtype=np.uint64) for d in docs]
    ids = list(range(100, 100 + len(docs)))
    n = len(docs)
    ii, jj = np.triu_indices(n, 1)
    if len(ii) == 0:
        return
    lengths = np.array([len(t) for t in toks], dtype=np.int64)
    flat = np.concatenate(toks) if lengths.sum() else np.zeros(0, dtype=np.uint64)
    col = dedup._toks_to_binary(lengths, flat)
    got = dedup._jaccard_of_pairs(
        np.array(ids)[ii], np.array(ids)[jj],
        col.take(pa.array(ii, type=pa.int64())),
        col.take(pa.array(jj, type=pa.int64())),
    ).to_pandas()
    got_set = {(a, b): j for a, b, j in zip(got.doc_id_a, got.doc_id_b, got.jac_bp)}
    want = {}
    for i in range(n):
        for j in range(i + 1, n):
            a, b = set(toks[i].tolist()), set(toks[j].tolist())
            inter, union = len(a & b), len(a | b)
            if union and dedup.JACCARD_DEN * inter >= dedup.JACCARD_NUM * union:
                want[(ids[i], ids[j])] = (10000 * inter) // union
    assert got_set == want


@settings(**SET)
@given(
    lens=st.lists(st.integers(1, 30), min_size=1, max_size=40),
    seed=st.integers(0, 2**31 - 1),
    rpf=st.integers(1, 7),
)
def test_datagen_gather_roundtrip(lens, seed, rpf, tmp_path_factory):
    """_gather_tokens must reproduce each row's exact token slice regardless
    of partitioning (the int32-offset-overflow fix path)."""
    import numpy as np

    from seronet_data_validator_ray.datagen import _gather_tokens

    rng = np.random.default_rng(seed)
    lengths = np.array(lens, dtype=np.int64)
    offsets = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    values = rng.integers(0, 1000, size=int(lengths.sum()), dtype=np.int32)
    rows = rng.permutation(len(lens))[: max(1, len(lens) // 2)]
    arr = _gather_tokens(np.sort(rows), lengths, offsets, values)
    for out_i, r in enumerate(np.sort(rows)):
        want = values[offsets[r] : offsets[r + 1]].tolist()
        assert arr[out_i].as_py() == want


@settings(**SET)
@given(
    live=st.lists(st.integers(0, 600), min_size=1, max_size=60),
    total=st.lists(st.integers(0, 600), min_size=1, max_size=60),
    seed=st.integers(0, 10**6),
)
def test_ratio_eq_matches_decimal_half_away(live, total, seed):
    """ratio_eq's integer-tenths compare == exact decimal half-away rounding."""
    import numpy as np
    from decimal import ROUND_HALF_UP, Decimal

    from seronet_data_validator_ray.rules.kernels import k_ratio_eq

    n = min(len(live), len(total))
    live, total = live[:n], total[:n]
    rng = np.random.default_rng(seed)
    # declared value: sometimes the true rounded ratio, sometimes off
    declared = []
    for l, t in zip(live, total):
        if t == 0:
            declared.append(None if rng.random() < 0.5 else 55.5)
        else:
            true = float(Decimal(1000 * l) / Decimal(t) / 10)
            declared.append(true if rng.random() < 0.5 else true + 7.7)
    tbl = pa.table(
        {
            "v": pa.array(declared, type=pa.float64()),
            "l": pa.array(live, type=pa.int64()),
            "t": pa.array(total, type=pa.int64()),
        }
    )
    mask, _obs = k_ratio_eq(tbl, "v", {"num": "l", "den": "t"}, {})
    for i, (l, t, d) in enumerate(zip(live, total, declared)):
        if d is None or t == 0:
            assert not mask[i]
            continue
        want = (Decimal(100 * l) / Decimal(t)).quantize(Decimal("0.1"), ROUND_HALF_UP)
        got_tenths = (Decimal(str(d)) * 10).quantize(Decimal("1"), ROUND_HALF_UP)
        assert bool(mask[i]) == (want * 10 != got_tenths), (l, t, d)


@settings(**SET)
@given(
    years=st.lists(st.integers(1900, 2024), min_size=1, max_size=40),
    values=st.lists(st.integers(0, 4000), min_size=1, max_size=40),
    units=st.lists(st.sampled_from(["Day", "Week", "Month", "Year"]), min_size=1, max_size=40),
)
def test_duration_future_matches_datetime(years, values, units):
    """duration_future's vectorized day arithmetic == datetime.date, and the
    month/year branches == the reference's integer formulas."""
    import datetime

    from seronet_data_validator_ray.rules.kernels import k_duration_future

    n = min(len(years), len(values), len(units))
    years, values, units = years[:n], values[:n], units[:n]
    tbl = pa.table(
        {
            "v": pa.array([float(v) for v in values], type=pa.float64()),
            "u": pa.array(units, type=pa.string()),
            "y": pa.array(years, type=pa.int32()),
        }
    )
    ref = datetime.date(2024, 6, 15)
    mask, _ = k_duration_future(
        tbl, "v", {"unit_col": "u", "year_col": "y", "ref_date": "2024-06-15"}, {}
    )
    for i in range(n):
        v, u, y = values[i], units[i], years[i]
        if u == "Day":
            want = v > (ref - datetime.date(y, 1, 1)).days
        elif u == "Month":
            want = v + 12 * y > 12 * ref.year + ref.month
        elif u == "Year":
            want = v + y > ref.year
        else:  # Week: the reference has no branch for it
            want = False
        assert bool(mask[i]) == want, (v, u, y)


@settings(**SET)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["", "x", "y–z", "echo", "–"]),
            st.sampled_from(["", "1", "echo", "a–b"]),
            st.sampled_from(["", "2.5", "echo"]),
        ),
        min_size=0,
        max_size=40,
    )
)
def test_cleanup_batch_matches_bruteforce(rows):
    """cleanup_batch == the reference's row-drop semantics replayed naively:
    drop all-empty rows, drop rows whose every cell equals column 0's value,
    drop Unnamed* columns, en-dash -> hyphen."""
    from seronet_data_validator_ray.sources.csv_source import cleanup_batch

    tbl = pa.table(
        {
            "a": pa.array([r[0] for r in rows], type=pa.string()),
            "b": pa.array([r[1] for r in rows], type=pa.string()),
            "Unnamed: 2": pa.array([r[2] for r in rows], type=pa.string()),
        }
    )
    got = cleanup_batch(tbl)
    assert got.column_names == ["a", "b"]
    want = []
    for r in rows:
        all_empty = all(c == "" for c in r)
        all_eq = all(c == r[0] for c in r)
        if not (all_empty or all_eq):
            want.append((r[0].replace("–", "-"), r[1].replace("–", "-")))
    assert list(zip(got["a"].to_pylist(), got["b"].to_pylist())) == want


@settings(**SET)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from(list("ab ") ),
            min_size=0,
            max_size=400,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_chunk_batch_matches_python_reference(texts):
    """chunk_batch (vectorized flat-buffer gather + binary_join) equals a
    plain-Python reference on arbitrary single-space-split inputs, including
    consecutive spaces (empty words), leading/trailing spaces and ''."""
    from seronet_data_validator_ray.functions.op_queries import (
        CHUNK_STRIDE,
        CHUNK_WORDS,
        chunk_batch,
    )

    batch = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    got = chunk_batch(batch).to_pylist()
    expect = []
    for i, txt in enumerate(texts):
        ws = txt.split(" ")
        for k, start in enumerate(range(0, max(len(ws) - 1, 0) + 1, CHUNK_STRIDE)):
            seg = ws[start : start + CHUNK_WORDS]
            expect.append(
                {
                    "doc_id": i,
                    "chunk_id": k,
                    "n_words": len(seg),
                    "chunk_text": " ".join(seg),
                }
            )
    assert got == expect


@settings(**SET)
@given(
    blocks=st.lists(
        st.lists(st.integers(0, 300), min_size=0, max_size=400),
        min_size=1,
        max_size=8,
    )
)
def test_misra_gries_merge_undercount_bound(blocks):
    """After per-block compression + pairwise merges, every surviving count
    underestimates the true count by at most N/(C+1), and every item with
    true count > N/(C+1) survives."""
    from seronet_data_validator_ray.functions.op_queries import mg_partial

    C = 16
    merged_t = np.array([], dtype=object)
    merged_c = np.array([], dtype=np.int64)
    all_items = []
    for b in blocks:
        all_items.extend(b)
        if not b:
            continue
        ids, cnt = np.unique(np.array(b), return_counts=True)
        t, c = mg_partial(ids.astype(object), cnt.astype(np.int64), C)
        bt = np.concatenate([merged_t, t])
        bc = np.concatenate([merged_c, c])
        u, inv = np.unique(bt, return_inverse=True)
        acc = np.zeros(len(u), dtype=np.int64)
        np.add.at(acc, inv, bc)
        merged_t, merged_c = mg_partial(u, acc, C)
    if not all_items:
        return
    n = len(all_items)
    true_ids, true_cnt = np.unique(np.array(all_items), return_counts=True)
    true_of = dict(zip(true_ids.tolist(), true_cnt.tolist()))
    bound = n // (C + 1)
    kept = dict(zip(merged_t.tolist(), merged_c.tolist()))
    for item, cnt in kept.items():
        assert cnt <= true_of[item]
        assert true_of[item] - cnt <= bound
    for item, cnt in true_of.items():
        if cnt > bound:
            assert item in kept


@settings(**SET)
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 40)), min_size=1, max_size=120
    )
)
def test_wau_covered_days_match_bruteforce(pairs):
    """The WAU run-expansion (merge [d, d+6] coverage intervals per user)
    must equal the brute-force 'user covers day iff active in [day-6, day]'
    count for every day."""
    from seronet_data_validator_ray.pipelines.table_queries import _wau_covered_day_counts

    user = np.array([p[0] for p in pairs], dtype=np.int64)
    day = np.array([p[1] for p in pairs], dtype=np.int64)
    days_u, counts = _wau_covered_day_counts(user, day)
    got = dict(zip(days_u.tolist(), counts.tolist()))
    active = {}
    for u, d in pairs:
        active.setdefault(u, set()).add(d)
    lo, hi = day.min(), day.max() + 7
    want = {}
    for dd in range(lo, hi):
        n = sum(1 for u, ds in active.items() if any(dd - 6 <= a <= dd for a in ds))
        if n:
            want[dd] = n
    assert got == want


@settings(**SET)
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 40)), min_size=1, max_size=120
    )
)
def test_retention_offsets_match_bruteforce(pairs):
    """(cohort = per-user min active day, offset) counts must match the
    brute-force recomputation on distinct (user, day)."""
    from seronet_data_validator_ray.pipelines.table_queries import _retention_offset_counts

    user = np.array([p[0] for p in pairs], dtype=np.int64)
    day = np.array([p[1] for p in pairs], dtype=np.int64)
    uniq, counts = _retention_offset_counts(user, day)
    got = {(int(c), int(o)): int(n) for (c, o), n in zip(uniq.tolist(), counts.tolist())}
    active = {}
    for u, d in pairs:
        active.setdefault(u, set()).add(d)
    want = {}
    for u, ds in active.items():
        c = min(ds)
        for d in ds:
            want[(c, d - c)] = want.get((c, d - c), 0) + 1
    assert got == want


@settings(**SET)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 60), st.booleans()),
        min_size=1, max_size=100, unique_by=lambda r: (r[0], r[1], r[2]),
    ),
    n_parts=st.integers(1, 4),
)
def test_asof_reduce_matches_bruteforce(rows, n_parts):
    """The vectorized segmented as-of merge must match the per-purchase
    brute force (latest same-user click with ts <= purchase ts) for any
    interleaving of users/sides — including rows split across partial
    tables, click/purchase ts ties (>= matches), and no-click users."""
    from seronet_data_validator_ray.pipelines.table_queries import _asof_reduce

    eids = list(range(len(rows)))
    tbl = pa.table(
        {
            "bkey": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts_us": pa.array([r[1] for r in rows], type=pa.int64()),
            "event_id": pa.array(eids, type=pa.int64()),
            "is_purchase": pa.array([r[2] for r in rows], type=pa.bool_()),
        }
    )
    parts = [tbl.slice(i, max(1, len(rows) // n_parts + 1))
             for i in range(0, len(rows), max(1, len(rows) // n_parts + 1))]
    out = _asof_reduce(*parts).to_pandas()
    got = {int(r.event_id): (int(r.click_id), int(r.click_ts_us)) for r in out.itertuples()}
    want = {}
    for i, (u, ts, is_p) in enumerate(rows):
        if not is_p:
            continue
        cands = [(j, r[1]) for j, r in enumerate(rows)
                 if not r[2] and r[0] == u and r[1] <= ts]
        if cands:
            # unique best: (user, ts) is unique among clicks by construction
            j, cts = max(cands, key=lambda c: c[1])
            want[i] = (j, cts)
    assert got == want


def _lev_reference(a: bytes, b: bytes) -> int:
    """Textbook uncapped O(nm) Levenshtein, the independent oracle."""
    n, m = len(a), len(b)
    prev = list(range(m + 1))
    for i in range(1, n + 1):
        cur = [i] + [0] * m
        for j in range(1, m + 1):
            cur[j] = min(
                prev[j - 1] + (a[i - 1] != b[j - 1]), prev[j] + 1, cur[j - 1] + 1
            )
        prev = cur
    return prev[m]


@given(
    st.binary(max_size=24),
    st.binary(max_size=24),
    st.integers(min_value=0, max_value=12),
)
@settings(max_examples=120, deadline=None)
def test_lev_bytes_matches_reference(a, b, maxd):
    """The banded numpy DP (prefix-min insertion recurrence, early band
    exit) must equal the textbook DP whenever the true distance fits the
    band, and must report maxd+1 (never an under-estimate) when it does
    not — for arbitrary byte strings, including empty ones."""
    import numpy as np

    from seronet_data_validator_ray.functions.dedup import _lev_bytes

    got = _lev_bytes(
        np.frombuffer(a, dtype=np.uint8), np.frombuffer(b, dtype=np.uint8), maxd
    )
    want = _lev_reference(a, b)
    if want <= maxd:
        assert got == want
    else:
        # over the band the exact value is not contractual — only that the
        # result can never under-estimate into the keep range
        assert got > maxd


@given(
    st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 20)),
        min_size=1,
        max_size=40,
    ),
    st.integers(1, 4),
)
@settings(max_examples=80, deadline=None)
def test_pareto_mask_matches_bruteforce_and_is_distributive(points, n_blocks):
    """The vectorized skyline filter must equal the O(n²) dominance
    definition for arbitrary (price, size) multisets (ties included), and
    the split-into-blocks → local frontier → re-filter merge must be
    bit-identical to the single-pass answer (the distributivity the
    distributed plan relies on)."""
    import numpy as np

    from seronet_data_validator_ray.pipelines.table_queries import _pareto_mask

    price = np.array([p for p, _ in points], dtype=np.int64)
    size = np.array([s for _, s in points], dtype=np.int64)
    key = np.arange(len(points), dtype=np.int64)

    def dominated(i):
        return any(
            (price[j] <= price[i] and size[j] >= size[i])
            and (price[j] < price[i] or size[j] > size[i])
            for j in range(len(points))
        )

    want = {i for i in range(len(points)) if not dominated(i)}
    got = set(np.flatnonzero(_pareto_mask(price, size, key)).tolist())
    assert got == want

    # distributivity: local frontiers per block, then one re-filter
    surv = []
    for b in range(n_blocks):
        idx = np.array([i for i in range(len(points)) if i % n_blocks == b], dtype=np.int64)
        if not len(idx):
            continue
        m = _pareto_mask(price[idx], size[idx], key[idx])
        surv.extend(idx[m].tolist())
    surv = np.array(sorted(surv), dtype=np.int64)
    m2 = _pareto_mask(price[surv], size[surv], key[surv])
    assert set(surv[m2].tolist()) == want


@given(
    st.lists(
        st.lists(st.integers(-5, 50), max_size=12),
        min_size=1,
        max_size=30,
    ),
    st.integers(1, 5),
)
@settings(max_examples=60, deadline=None)
def test_token_seq_hash_separates_distinct_arrays(arrays, n_chunks):
    """token_seq_hash_batch must be a pure function of the token ARRAY
    (deterministic across arbitrary batch chunking) and must separate the
    classic near-misses the strategy generates — permutations, prefixes,
    [] vs [0] vs [0,0], negative tokens. On fixtures this small a 64-bit
    collision would be a real bug, not bad luck."""
    import numpy as np

    from seronet_data_validator_ray.functions.dedup import token_seq_hash_batch

    tbl = pa.table({"tokens": pa.array(arrays, type=pa.list_(pa.int32()))})
    h = token_seq_hash_batch(tbl)
    # determinism under chunking: hash each slice independently
    step = max(1, len(arrays) // n_chunks)
    parts = [token_seq_hash_batch(tbl.slice(i, step)) for i in range(0, len(arrays), step)]
    assert (np.concatenate(parts) == h).all()
    # equal content -> equal hash; distinct content -> distinct hash
    by_content = {}
    for arr, hv in zip(arrays, h.tolist()):
        by_content.setdefault(tuple(arr), set()).add(hv)
    assert all(len(v) == 1 for v in by_content.values())
    hashes = [next(iter(v)) for v in by_content.values()]
    assert len(set(hashes)) == len(hashes)


@given(
    st.lists(
        st.lists(st.integers(-(2**31), 2**31 - 1), max_size=9),
        min_size=1,
        max_size=25,
    ),
    st.integers(1, 16),
)
@settings(max_examples=60, deadline=None)
def test_token_seq_hash_internal_chunking_invariant(arrays, chunk_tokens):
    """The scratch-buffer chunked evaluation (round 5: no flat-sized
    temporaries) must be invariant to the internal chunk budget — forcing
    _TOKSEQ_CHUNK down to a few tokens exercises every chunk-boundary shape
    (empty rows at boundaries, rows spanning chunks, oversize single rows)
    against the default one-chunk result. int32 extremes are in-strategy:
    2^31-1 + C overflowing a demoted int32 add loop was a real planted bug."""
    import numpy as np

    from seronet_data_validator_ray.functions import dedup

    tbl = pa.table({"tokens": pa.array(arrays, type=pa.list_(pa.int32()))})
    base = dedup.token_seq_hash_batch(tbl)
    orig = dedup._TOKSEQ_CHUNK
    try:
        dedup._TOKSEQ_CHUNK = chunk_tokens
        forced = dedup.token_seq_hash_batch(tbl)
    finally:
        dedup._TOKSEQ_CHUNK = orig
    assert (forced == base).all()
    assert base.dtype == np.uint64
