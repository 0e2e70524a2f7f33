"""Cross-checks for the approximate / rows-only training-data operators:
each is validated against its exact counterpart or a brute-force
reimplementation on the sf0.01 tables."""

import os

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.01"


def _pairs_set(tbl, cols=("doc_id_a", "doc_id_b")):
    df = tbl.to_pandas()
    return set(zip(df[cols[0]], df[cols[1]]))


def test_minhash_matches_exact_jaccard(ray_session):
    from seronet_data_validator_ray.functions import dedup

    ex = dedup.jaccard_pairs_exact(SF).to_pandas().sort_values(
        ["doc_id_a", "doc_id_b"]).reset_index(drop=True)
    mh = dedup.minhash_lsh_pairs(SF).to_pandas().sort_values(
        ["doc_id_a", "doc_id_b"]).reset_index(drop=True)
    assert len(ex) > 0, "fixture should contain near-dup pairs at tau=0.9"
    assert ex.equals(mh), "LSH candidates + exact verify must equal the exact join here"


def test_minhash_distributed_paths_match_driver_paths(ray_session, monkeypatch):
    """Force the scale paths — raw-Ray bucketed candidate exchange AND the
    two-hash-join verify — and require bit-identical output to the (already
    oracle-checked) driver paths."""
    from seronet_data_validator_ray.functions import dedup

    small = dedup.minhash_lsh_pairs(SF)
    monkeypatch.setattr(dedup, "EXCHANGE_DRIVER_MAX_ROWS", 0)
    monkeypatch.setattr(dedup, "DRIVER_VERIFY_MAX_DOCS", 0)
    big = dedup.minhash_lsh_pairs(SF)
    assert small.to_pandas().equals(big.to_pandas())


def test_simhash_matches_bruteforce(ray_session):
    from seronet_data_validator_ray.functions import dedup

    got = _pairs_set(dedup.simhash_pairs(SF))
    # brute force: recompute every signature locally, all-pairs hamming
    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    import pyarrow as pa

    emitted = dedup.simhash_emit_batch(tbl)
    sig_by_doc = {}
    for d, s in zip(emitted["doc_id"].to_pylist(), emitted["sig"].to_pylist()):
        sig_by_doc[d] = s & ((1 << 64) - 1)
    ids = sorted(sig_by_doc)
    want = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if (sig_by_doc[ids[i]] ^ sig_by_doc[ids[j]]).bit_count() <= dedup.HAM_T:
                want.add((ids[i], ids[j]))
    assert got == want
    assert len(want) > 0


def test_ivf_recall_vs_brute_force(ray_session):
    from seronet_data_validator_ray.functions import ann

    exact = ann.knn_brute_force(SF).to_pandas()
    approx = ann.ann_ivf(SF).to_pandas()
    recalls = []
    for q in exact["query_id"].unique():
        e = set(exact[exact.query_id == q]["vec_id"])
        a = set(approx[approx.query_id == q]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.5, f"IVF recall@10 too low: {recalls}"
    # every approx hit must carry the exact brute-force similarity
    merged = approx.merge(exact, on=["query_id", "vec_id"], suffixes=("_a", "_e"))
    assert (merged["sim_u_a"] == merged["sim_u_e"]).all()


def test_fingerprints_deterministic_and_shift_invariant(ray_session):
    import pyarrow as pa

    from seronet_data_validator_ray.functions import textstats

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    a = textstats.fingerprint_batch(tbl)
    b = textstats.fingerprint_batch(tbl)
    assert a.equals(b)
    assert (np.array(a["n_fp"]) > 0).all()
    # winnowing guarantee: ~1 fingerprint per window of text
    n_chars = np.array([len(t) for t in tbl["text"].to_pylist()])
    assert (np.array(a["n_fp"]) <= n_chars).all()


def test_media_plumbing_roundtrip(ray_session):
    import pytest

    from seronet_data_validator_ray.functions import media, op_queries

    feats = op_queries.media_features(SF).to_pandas()
    assert len(feats) == 500
    assert set(feats.columns) == {"doc_id", "width", "height", "n_frames", "feat_u"}
    assert feats["width"].between(16, 80).all()
    assert feats["n_frames"].between(1, 4).all()
    # decode is deterministic
    feats2 = op_queries.media_features(SF).to_pandas()
    assert feats.sort_values("doc_id").reset_index(drop=True).equals(
        feats2.sort_values("doc_id").reset_index(drop=True)
    )
    # the real-codec seam is an explicit stub
    with pytest.raises(NotImplementedError):
        media.MediaDecoder(real=True)


def test_dedup_clusters_structure(ray_session):
    from seronet_data_validator_ray.functions import dedup

    clusters = dedup.dedup_clusters(SF).to_pandas()
    pairs = dedup.minhash_lsh_pairs(SF).to_pandas()
    # every paired doc appears; reps are component minima; one keep per cluster
    paired = set(pairs.doc_id_a) | set(pairs.doc_id_b)
    assert set(clusters.doc_id) == paired
    assert (clusters.cluster_size >= 2).all()
    byrep = clusters.groupby("cluster_rep")
    assert (byrep["keep"].sum() == 1).all()
    for rep, g in byrep:
        assert rep == g.doc_id.min()
        assert len(g) == g.cluster_size.iloc[0]
    # pair endpoints always share a cluster
    rep_of = dict(zip(clusters.doc_id, clusters.cluster_rep))
    assert all(rep_of[a] == rep_of[b] for a, b in zip(pairs.doc_id_a, pairs.doc_id_b))


def test_media_frames_expansion(ray_session):
    from seronet_data_validator_ray.functions import media, op_queries

    feats = op_queries.media_features(SF).to_pandas()
    # library path keeps the frame digest; the registered query drops it
    # (covered there by the generate_series oracle instead)
    frames = media.media_frames(SF).to_pandas()
    # row expansion: total frames == sum of per-doc n_frames
    assert len(frames) == int(feats["n_frames"].sum())
    per_doc = frames.groupby("doc_id").size()
    merged = feats.set_index("doc_id")["n_frames"]
    assert (per_doc == merged.loc[per_doc.index]).all()
    # frame indices are 0..n-1 per doc and frame digests are distinct
    assert (frames.groupby("doc_id")["frame_idx"].max() + 1 == per_doc).all()
    assert frames["frame_u"].nunique() == len(frames)


def test_sessionize_multiblock_matches_bruteforce(ray_session):
    """Arrow-native sessionize must survive users whose event streams span
    many blocks (the boundary-merge path) — checked against a per-user
    brute-force recomputation."""
    import pyarrow as pa
    import ray.data

    from seronet_data_validator_ray.functions.windows import sessionize

    rng = np.random.default_rng(7)
    n, n_users = 5000, 25
    users = rng.integers(0, n_users, n).astype(np.int64)
    ts = np.sort(rng.integers(0, 2 * 10**11, n).astype(np.int64))
    rng.shuffle(ts)
    tbl = pa.table(
        {
            "user_id": pa.array(users),
            "ts": pa.array(ts).cast(pa.timestamp("us")),
        }
    )
    chunks = [tbl.slice(i, 250) for i in range(0, n, 250)]  # 20 blocks
    got = (
        sessionize(ray.data.from_arrow(chunks), gap_minutes=30.0)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    gap = int(30 * 60 * 1e6)
    rows = []
    for u in sorted(set(users.tolist())):
        t = np.sort(ts[users == u])
        brk = np.nonzero(np.diff(t) > gap)[0]
        bounds = np.concatenate([[0], brk + 1, [len(t)]])
        counts = np.diff(bounds)
        rows.append(
            {
                "user_id": u,
                "n_sessions": len(counts),
                "n_events": len(t),
                "max_session_events": int(counts.max()),
            }
        )
    import pandas as pd

    exp = pd.DataFrame(rows)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_cosine_near_dup_ivf_recall(ray_session):
    """IVF-bucketed near-dup: every reported pair must carry the EXACT
    similarity of the brute-force join, and recall must be high."""
    from seronet_data_validator_ray.functions import ann

    exact = ann.cosine_near_dup(SF).to_pandas()
    approx = ann.cosine_near_dup_ivf(SF).to_pandas()
    e = {(a, b): s for a, b, s in zip(exact.vec_id_a, exact.vec_id_b, exact.sim_u)}
    a = {(x, y): s for x, y, s in zip(approx.vec_id_a, approx.vec_id_b, approx.sim_u)}
    assert set(a) <= set(e), "IVF must not invent pairs (verify is exact)"
    assert all(e[k] == v for k, v in a.items()), "reported sims must be exact"
    assert len(e) > 0
    assert len(a) / len(e) >= 0.6, f"recall too low: {len(a)}/{len(e)}"


def test_cosine_ivf_exchange_and_salting_match_driver(ray_session):
    """cosine_near_dup_ivf through the forced bucketed exchange with tiny
    hot_rows (every IVF bucket salted over shard-pair subtasks) must emit
    the IDENTICAL pair set as the driver-reduce path — the shard-pair grid
    covers every within-bucket pair exactly once."""
    from seronet_data_validator_ray.functions import ann

    base = ann.cosine_near_dup_ivf(SF).to_pandas()
    salted = ann.cosine_near_dup_ivf(SF, driver_max_rows=0, hot_rows=16).to_pandas()
    assert len(base) > 0
    cols = list(base.columns)
    assert base.sort_values(cols).reset_index(drop=True).equals(
        salted.sort_values(cols).reset_index(drop=True)
    )


def test_ivf_buckets_bounded_on_clustered_sorted_input(ray_session, tmp_path):
    """The IVF build must not degenerate on a cluster-SORTED file (the case
    that breaks first-rows sampling: a fit that only ever saw cluster #0
    routes everything to a handful of giant buckets). With the unbiased
    hash-sample + hash-init combiner fit, centroids cover all clusters and
    the max bucket stays within a small factor of the mean occupancy."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from seronet_data_validator_ray.functions import ann
    from seronet_data_validator_ray.stages.evaluate import _resolve_broadcast

    rng = np.random.default_rng(7)
    n_clusters, per, dim = 64, 32, 16
    n = n_clusters * per
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = np.repeat(centers, per, axis=0) + 0.05 * rng.normal(size=(n, dim))
    # SORTED by cluster — the adversarial layout for first-rows sampling
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array([list(map(float, v)) for v in vecs]),
            "label": pa.array(["x"] * n),
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "embeddings.parquet"))

    k, cents = ann._fit_centroids(str(tmp_path))
    assert k == ann._ivf_k(n)
    import ray

    cents_ref = ray.put({"cents": cents})
    emitted = ann._ivf_bucket_emit(t, cents_ref=cents_ref)
    bkey = emitted["bkey"].to_numpy(zero_copy_only=False)
    sizes = np.bincount(bkey, minlength=k)
    mean_occ = n * ann.IVF_NPROBE / k
    assert sizes.max() <= 8 * mean_occ, (
        f"hot bucket {sizes.max()} vs mean {mean_occ:.0f} — fit collapsed"
    )


def test_group_quantiles_accuracy(ray_session):
    """Per-group t-digest quantiles within 2% relative error of exact."""
    import duckdb

    from seronet_data_validator_ray.functions import op_queries

    got = op_queries.approx_quantiles_by_group(SF).to_pandas().set_index("l_returnflag")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS FROM read_parquet('{SF}/lineitem.parquet')")
    exact = con.execute(
        """SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) p50,
                  quantile_cont(l_extendedprice, 0.95) p95
           FROM lineitem GROUP BY l_returnflag"""
    ).df().set_index("l_returnflag")
    con.close()
    assert set(got.index) == set(exact.index)
    for g in exact.index:
        for col, ex in (("p50_cents", exact.loc[g, "p50"] * 100), ("p95_cents", exact.loc[g, "p95"] * 100)):
            assert abs(got.loc[g, col] - ex) / ex < 0.02, (g, col, got.loc[g, col], ex)


def test_distinct_users_exchange_path_matches_driver(ray_session, monkeypatch):
    """The skew-proof exchange path for exact per-group distinct must equal
    the (oracle-checked) driver path bit-for-bit."""
    from seronet_data_validator_ray.pipelines import table_queries as tq

    small = tq.distinct_users_per_type(SF)
    monkeypatch.setattr(tq, "DISTINCT_DRIVER_MAX_ROWS", 0)
    big = tq.distinct_users_per_type(SF)
    assert small.to_pandas().equals(big.to_pandas())


def test_running_number_multiblock(ray_session):
    """Distributed prefix scan: per-user row numbers must be exact when a
    user's events span many blocks (the base-offset stitch path)."""
    import pyarrow as pa
    import ray.data

    from seronet_data_validator_ray.functions.windows import running_number

    rng = np.random.default_rng(11)
    n, n_users = 4000, 12
    users = rng.integers(0, n_users, n).astype(np.int64)
    ts = rng.integers(0, 10**10, n).astype(np.int64)
    eid = np.arange(n, dtype=np.int64)
    tbl = pa.table(
        {
            "event_id": pa.array(eid),
            "user_id": pa.array(users),
            "ts": pa.array(ts).cast(pa.timestamp("us")),
        }
    )
    chunks = [tbl.slice(i, 200) for i in range(0, n, 200)]  # 20 blocks
    got = (
        running_number(ray.data.from_arrow(chunks))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # brute force row_number per user ordered by (ts, event_id)
    import pandas as pd

    df = pd.DataFrame({"event_id": eid, "user_id": users, "ts": ts})
    df = df.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    df["rn"] = df.groupby("user_id").cumcount() + 1
    want = df.sort_values("event_id").reset_index(drop=True)[["event_id", "user_id", "rn"]]
    pd.testing.assert_frame_equal(got[["event_id", "user_id", "rn"]], want, check_dtype=False)


def test_running_number_distributed_prefix_path(ray_session):
    """Forcing driver_max_rows=0 exercises the user-hash bucketed exchange
    (the 100 TB path: per-user offsets never materialize on the driver) and
    must be bit-identical to the driver-merge path, value column included."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from seronet_data_validator_ray.functions.windows import running_number

    rng = np.random.default_rng(23)
    n, n_users = 3000, 9
    users = rng.integers(0, n_users, n).astype(np.int64)
    ts = rng.integers(0, 10**10, n).astype(np.int64)
    eid = np.arange(n, dtype=np.int64)
    val = rng.uniform(0, 50, n).round(2)
    tbl = pa.table(
        {
            "event_id": pa.array(eid),
            "user_id": pa.array(users),
            "ts": pa.array(ts).cast(pa.timestamp("us")),
            "value": pa.array(val),
        }
    )
    chunks = [tbl.slice(i, 150) for i in range(0, n, 150)]
    small = (
        running_number(ray.data.from_arrow(chunks), value_col="value")
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    big = (
        running_number(ray.data.from_arrow(chunks), value_col="value", driver_max_rows=0)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(small, big)
    # exact vs pandas window brute force
    df = pd.DataFrame({"event_id": eid, "user_id": users, "ts": ts, "value": val})
    df = df.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    cents = (df["value"] * 100).round().astype(np.int64)
    df["running_cents"] = cents.groupby(df["user_id"]).cumsum()
    want = df.sort_values("event_id").reset_index(drop=True)
    assert (big["running_cents"].to_numpy() == want["running_cents"].to_numpy()).all()


def test_sessionize_distributed_merge_path(ray_session):
    """Forcing driver_max_rows=0 exercises the user-hash bucketed boundary
    merge; must equal the driver-path output exactly."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from seronet_data_validator_ray.functions.windows import sessionize

    rng = np.random.default_rng(31)
    n, n_users = 4000, 17
    users = rng.integers(0, n_users, n).astype(np.int64)
    ts = np.sort(rng.integers(0, 2 * 10**11, n).astype(np.int64))
    rng.shuffle(ts)
    tbl = pa.table(
        {"user_id": pa.array(users), "ts": pa.array(ts).cast(pa.timestamp("us"))}
    )
    chunks = [tbl.slice(i, 200) for i in range(0, n, 200)]
    small = sessionize(ray.data.from_arrow(chunks), gap_minutes=30.0).to_pandas()
    big = (
        sessionize(ray.data.from_arrow(chunks), gap_minutes=30.0, driver_max_rows=0)
        .to_pandas()
    )
    pd.testing.assert_frame_equal(
        small.sort_values("user_id").reset_index(drop=True),
        big.sort_values("user_id").reset_index(drop=True),
    )


def _boilerplate_docs_dir(tmp_path_factory=None):
    """Corpus with ONE planted boilerplate prefix: half the docs share a
    30-token template (hot block key / hot LSH buckets), arranged in exact
    near-dup clusters so the pair set is non-trivial."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = "/tmp/graft_docs/boilerplate-400"
    path = f"{out}/documents.parquet"
    if os.path.exists(path):
        return out
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(5)
    boiler = " ".join(f"tpl{i}" for i in range(30))
    texts, ids = [], []
    for i in range(200):  # hot half: template + tiny per-cluster suffix
        cluster, member = divmod(i, 4)
        suffix = f"c{cluster}a c{cluster}b" + (f" v{member}" if member else "")
        texts.append(boiler + " " + suffix)
        ids.append(i)
    for i in range(200, 400):  # cold half: random vocab
        toks = rng.integers(0, 5000, rng.integers(8, 40))
        texts.append(" ".join(f"w{t}" for t in toks))
        ids.append(i)
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, type=pa.int64()), "text": pa.array(texts)}),
        path,
    )
    return out


def test_hot_bucket_salting_matches_unsalted(ray_session):
    """Salted (hot_rows forced tiny) and unsalted runs of all three pair
    producers must emit IDENTICAL pair sets on a boilerplate-prefix corpus —
    the shard-pair grid covers every hot-segment pair exactly once."""
    from seronet_data_validator_ray.functions import dedup

    d = _boilerplate_docs_dir()
    for fn in (dedup.minhash_lsh_pairs, dedup.jaccard_pairs_exact, dedup.simhash_pairs):
        base = fn(d).to_pandas()
        salted = fn(d, hot_rows=24, driver_max_rows=0).to_pandas()
        assert len(base) > 50, f"{fn.__name__}: fixture produced too few pairs"
        pdt = base.sort_values(list(base.columns)).reset_index(drop=True)
        sdt = salted.sort_values(list(salted.columns)).reset_index(drop=True)
        assert pdt.equals(sdt), f"{fn.__name__}: salted != unsalted"


def test_components_label_propagation_matches_union_find(ray_session):
    """The distributed label-propagation fallback (forced via
    driver_max_pairs=0) must produce the same (node, root) table as the
    driver union-find on a graph with chains, cliques and singleton-free
    components."""
    import pyarrow as pa

    from seronet_data_validator_ray.functions.dedup import components_table

    rng = np.random.default_rng(13)
    edges = []
    edges += [(i, i + 1) for i in range(0, 40)]          # one long chain
    edges += [(100 + i, 100 + j) for i in range(6) for j in range(i + 1, 6)]  # clique
    for c in range(20):                                   # random small comps
        base = 1000 + 10 * c
        k = rng.integers(2, 6)
        for i in range(k - 1):
            edges.append((base + i, base + rng.integers(i + 1, k)))
    a = pa.array([e[0] for e in edges], type=pa.int64())
    b = pa.array([e[1] for e in edges], type=pa.int64())
    pairs = pa.table({"doc_id_a": a, "doc_id_b": b})
    small = components_table(pairs).to_pandas()
    big = components_table(pairs, driver_max_pairs=0).to_pandas()
    assert small.equals(big)
    # chain collapses to min 0; clique to 100
    roots = dict(zip(small.node, small.root))
    assert all(roots[i] == 0 for i in range(41))
    assert all(roots[100 + i] == 100 for i in range(6))


def test_dedup_clusters_both_paths(ray_session):
    """dedup_clusters via the forced label-propagation path equals the
    union-find path on the real corpus."""
    from seronet_data_validator_ray.functions.dedup import dedup_clusters

    small = dedup_clusters(SF).to_pandas()
    big = dedup_clusters(SF, driver_max_pairs=0).to_pandas()
    assert small.equals(big)


def test_shingle_hash_order_sensitive():
    """Regression: the chained shingle hash must distinguish token order in
    the FIRST two positions ('a row line' vs 'row a line' collided when the
    head token was fed unmixed into the symmetric xor chain)."""
    import pyarrow as pa

    from seronet_data_validator_ray.functions.contamination import (
        shingle_hashes,
        shingle_positions,
    )
    from seronet_data_validator_ray.functions.dedup import _split_tokens

    texts = pa.array(["a row line", "row a line", "line row a", "a line row"])
    lengths, tok_ids, dict_strs = _split_tokens(texts)
    _, starts = shingle_positions(lengths, 3)
    h = shingle_hashes(tok_ids, dict_strs, starts, 3)
    assert len(set(h.tolist())) == 4, "permutations must hash distinctly"


def test_decontaminate_scanner_matches_bruteforce(ray_session):
    """ContaminationScanner (hash pre-filter + exact verify) equals a
    per-doc brute-force shingle-set intersection on the sf0.01 corpus."""
    import pyarrow as pa

    from seronet_data_validator_ray.functions.contamination import (
        BENCH_MOD,
        K,
        ContaminationScanner,
        _bench_partial,
    )

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    bp = _bench_partial(tbl)
    h = np.unique(bp["h"].to_numpy(zero_copy_only=False))
    strings = frozenset(bp["s"].to_pylist())
    got = ContaminationScanner(bench=(h, strings))(tbl).to_pandas()
    got = dict(zip(got.doc_id, got.n_hits))

    # brute force: python shingle sets
    bench = set()
    rows = tbl.to_pylist()
    for r in rows:
        if r["doc_id"] % BENCH_MOD == 0:
            w = r["text"].split(" ")
            bench.update(" ".join(w[i : i + K]) for i in range(len(w) - K + 1))
    want = {}
    for r in rows:
        if r["doc_id"] % BENCH_MOD == 0:
            continue
        w = r["text"].split(" ")
        n = sum(" ".join(w[i : i + K]) in bench for i in range(len(w) - K + 1))
        if n:
            want[r["doc_id"]] = n
    assert got == want and len(want) > 0


def test_window_dedup_multiblock_matches_pandas(ray_session):
    """window_dedup's cross-block last-row chaining must survive a stream
    where one (user, type) run spans many tiny blocks."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from seronet_data_validator_ray.functions.windows import window_dedup

    rng = np.random.default_rng(11)
    n = 4000
    users = rng.integers(0, 8, n).astype(np.int64)
    types = np.array(["a", "b"], dtype=object)[rng.integers(0, 2, n)]
    ts = rng.integers(0, 10**9, n).astype(np.int64)  # us, dense -> many dups
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(users),
            "event_type": pa.array(types.tolist(), type=pa.string()),
            "ts": pa.array(ts).cast(pa.timestamp("us")),
        }
    )
    gap = 5_000_000
    chunks = [tbl.slice(i, 100) for i in range(0, n, 100)]  # 40 blocks
    got = window_dedup(ray.data.from_arrow(chunks), gap_max_us=gap).to_pandas()

    df = tbl.to_pandas().sort_values(["user_id", "event_type", "ts", "event_id"])
    g = df.groupby(["user_id", "event_type"], sort=False)
    gap_us = (df["ts"] - g["ts"].shift()).dt.total_seconds() * 1e6
    want = df[gap_us.notna() & (gap_us <= gap)].sort_values("event_id")
    assert list(got["event_id"]) == list(want["event_id"])
    assert len(got) > 0


def test_kmeans_matches_numpy_reference(ray_session):
    """Distributed exact Lloyd must equal the single-process numpy reference
    (same init, same 1e-6 rounding) and be invariant to block count."""
    import pyarrow as pa
    import ray.data

    from seronet_data_validator_ray.functions.kmeans import (
        kmeans_assignments,
        kmeans_fit,
        kmeans_reference,
    )

    tbl = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = tbl["vec_id"].to_numpy(zero_copy_only=False)
    vecs = (
        tbl["embedding"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
        .astype(np.float64).reshape(len(ids), -1)
    )
    ref_cents, ref_assign = kmeans_reference(vecs, ids)

    got = kmeans_assignments(SF).to_pandas()
    order = np.argsort(ids, kind="stable")
    assert list(got["vec_id"]) == list(ids[order])
    assert list(got["cluster"]) == list(ref_assign)
    assert got["cluster"].nunique() > 1

    # block-count invariance: 1 block vs many tiny blocks
    chunks = [tbl.slice(i, 40) for i in range(0, len(tbl), 40)]
    c_many = kmeans_fit(ray.data.from_arrow(chunks))
    c_one = kmeans_fit(ray.data.from_arrow(tbl))
    assert np.array_equal(c_many, c_one)


def test_seq_drift_flags_planted_source(ray_session):
    """The bad generator shifts ALL of source 'forums' into the upper token
    half (datagen.py drift plant); seq_drift must flag exactly that source at
    sf0.001, and the scaled-KS invariants must hold (ks <= N_o*N_r, books'
    histograms differ only via planted token-value mutations)."""
    from seronet_data_validator_ray.pipelines.seq_queries import REGISTRY

    t = REGISTRY["seq_drift"][0]("/root/testdata/sf0.001").to_pandas()
    assert set(t.columns) >= {"source", "ks_tok", "drifted", "n_tok_obs", "n_tok_ref"}
    flagged = set(t[t.drifted == 1].source)
    assert flagged == {"forums"}
    assert (t.ks_tok <= t.n_tok_obs * t.n_tok_ref).all()
    assert (t.ks_len <= t.n_rows_obs * t.n_rows_ref).all()
    # forums' drift is total: every token moved to the upper half, so the
    # scaled D must exceed 40% of the maximum possible value
    f = t[t.source == "forums"].iloc[0]
    assert f.ks_tok > 0.4 * f.n_tok_obs * f.n_tok_ref


def test_dup_ngrams_invariants(ray_session):
    """Per-doc duplicated-8-gram counts are bounded by the doc's total grams,
    and a doc pair sharing a planted 8-gram span is detected symmetrically."""
    from seronet_data_validator_ray.functions.op_queries import REGISTRY

    t = REGISTRY["docs_dup_ngrams"][0]("/root/testdata/sf0.001").to_pandas()
    assert (t.n_dup_ngrams <= t.n_ngrams).all()
    assert (t.n_dup_ngrams >= 0).all()
    # duplicated spans exist in the synthetic corpus and never cover ALL docs
    assert 0 < (t.n_dup_ngrams > 0).sum() < len(t)


def test_dedup_spans_planted_rewrite(ray_session, tmp_path):
    """Exact rewritten text on a planted corpus: docs 1 and 2 share one
    8-word span (both copies excised, per-side context kept), doc 3 shares
    nothing (unchanged), doc 4 is one giant duplicated span of doc 1's
    (rewritten to empty). Removal is the union of covering 8-gram windows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from seronet_data_validator_ray.functions.op_queries import REGISTRY

    span = "w1 w2 w3 w4 w5 w6 w7 w8"  # exactly one 8-gram
    texts = {
        1: f"alpha beta {span} gamma delta",
        2: f"left {span} right",
        3: "nothing shared here at all in this document",
        4: span,
    }
    t = pa.table(
        {
            "doc_id": pa.array(list(texts), type=pa.int64()),
            "text": pa.array(list(texts.values()), type=pa.string()),
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "documents.parquet"))
    out = (
        REGISTRY["docs_dedup_spans"][0](str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
    )
    assert out.loc[1, "text_clean"] == "alpha beta gamma delta"
    assert out.loc[1, "n_removed"] == 8
    assert out.loc[2, "text_clean"] == "left right"
    assert out.loc[3, "text_clean"] == texts[3] and out.loc[3, "n_removed"] == 0
    assert out.loc[4, "text_clean"] == "" and out.loc[4, "n_removed"] == 8


def test_tfidf_topk_per_doc(ray_session):
    """docs_tfidf returns at most K rows per doc, scores are the exact
    integer surrogate tf*1e6//df, and every df is a plausible corpus DF."""
    from seronet_data_validator_ray.functions.op_queries import _TFIDF_K, REGISTRY

    t = REGISTRY["docs_tfidf"][0]("/root/testdata/sf0.001").to_pandas()
    per_doc = t.groupby("doc_id").size()
    assert (per_doc <= _TFIDF_K).all()
    assert ((t.tf * 1_000_000) // t.df == t.tfidf_scaled).all()
    # every doc yields >= 1 term row, so nunique == corpus size and df is
    # bounded by it
    n_docs = t.doc_id.nunique()
    assert (t.df >= 1).all() and (t.df <= n_docs).all()


def test_embedding_pca_matches_numpy(ray_session):
    """Distributed second-moment PCA equals single-shot numpy PCA on the
    same rows (sign-fixed loadings), and the projection is orthonormal."""
    from seronet_data_validator_ray.functions.op_queries import PCA_K, REGISTRY

    r = REGISTRY["embedding_pca"][0](SF)
    t = pq.read_table(os.path.join(SF, "embeddings.parquet"))
    X = np.asarray(
        t["embedding"].combine_chunks().values.to_numpy(zero_copy_only=False),
        dtype=np.float64,
    ).reshape(t.num_rows, -1)
    mu = X.mean(axis=0)
    cov = np.cov(X, rowvar=False)
    evals, evecs = np.linalg.eigh(cov)
    comps = evecs[:, ::-1][:, :PCA_K]
    sign = np.sign(comps[np.abs(comps).argmax(axis=0), np.arange(PCA_K)])
    sign[sign == 0] = 1.0
    comps = comps * sign
    expect = (X - mu) @ comps
    order = np.argsort(t["vec_id"].to_numpy())
    mine = np.column_stack([r[f"pc{k + 1}"].to_numpy() for k in range(PCA_K)])
    assert np.abs(mine - expect[order]).max() < 1e-9
    assert np.abs(comps.T @ comps - np.eye(PCA_K)).max() < 1e-12


def test_chunk_covers_every_word(ray_session):
    """Every word index of every doc is covered by >= 1 chunk; consecutive
    chunks overlap by CHUNK_WORDS - CHUNK_STRIDE words (except the tail)."""
    from seronet_data_validator_ray.functions.op_queries import (
        CHUNK_STRIDE,
        CHUNK_WORDS,
        REGISTRY,
    )

    t = REGISTRY["docs_chunk"][0]("/root/testdata/sf0.001").to_pandas()
    docs = pq.read_table(
        os.path.join("/root/testdata/sf0.001", "documents.parquet"),
        columns=["doc_id", "text"],
    ).to_pandas()
    nw = {r.doc_id: len(r.text.split(" ")) for r in docs.itertuples()}
    for doc_id, g in t.groupby("doc_id"):
        g = g.sort_values("chunk_id")
        starts = g.chunk_id.to_numpy() * CHUNK_STRIDE
        ends = starts + g.n_words.to_numpy()
        assert ends.max() == nw[doc_id]  # covers the last word exactly
        assert (starts[1:] < ends[:-1]).all() or len(g) == 1  # overlap
        assert (g.n_words <= CHUNK_WORDS).all()


def test_retention_first_offset_is_cohort_size(ray_session):
    """day_offset 0 of each cohort counts exactly that cohort's users, and
    no (cohort, offset) cell exceeds its cohort size."""
    from seronet_data_validator_ray.pipelines.table_queries import REGISTRY

    t = REGISTRY["events_retention"][0](SF).to_pandas()
    day0 = t[t.day_offset == 0].set_index("cohort_day").n_users
    for cohort, g in t.groupby("cohort_day"):
        assert (g.n_users <= day0[cohort]).all()
    ev = pq.read_table(os.path.join(SF, "events.parquet"), columns=["user_id"])
    assert day0.sum() == len(np.unique(ev["user_id"].to_numpy()))


def test_inverted_index_structure(ray_session):
    """df equals the posting-list length, postings are strictly increasing
    doc_ids, and every doc that contains a term appears in its postings."""
    from seronet_data_validator_ray.functions.op_queries import REGISTRY

    t = REGISTRY["docs_inverted_index"][0]("/root/testdata/sf0.001").to_pandas()
    docs = pq.read_table(
        os.path.join("/root/testdata/sf0.001", "documents.parquet"),
        columns=["doc_id", "text"],
    ).to_pandas()
    for r in t.itertuples():
        ids = [int(x) for x in r.postings.split(",")]
        assert len(ids) == r.df
        assert ids == sorted(set(ids))
    # spot-check one mid-frequency term end-to-end
    mid = t.sort_values("df").iloc[len(t) // 2]
    expect = sorted(
        int(d) for d, txt in zip(docs.doc_id, docs.text) if mid.term in txt.split(" ")
    )
    assert [int(x) for x in mid.postings.split(",")] == expect


def test_lm_score_bounds_and_direction(ray_session):
    """Scores are valid ppm fractions, and a doc made of the corpus's most
    common token scores above one made of rare tokens."""
    from seronet_data_validator_ray.functions.op_queries import REGISTRY

    t = REGISTRY["docs_lm_score"][0](SF).to_pandas()
    assert (t.mean_freq_ppm >= 0).all() and (t.mean_freq_ppm <= 1_000_000).all()
    assert t.n_words.min() >= 1
    assert t.mean_freq_ppm.nunique() > 1  # the score actually separates docs


def test_misra_gries_guarantee_on_adversarial_stream():
    """mg_partial keeps every item whose true frequency exceeds N/(C+1)
    under repeated compress-merge-compress cycles, on a stream whose
    vocabulary (10k) far exceeds the capacity (64)."""
    from seronet_data_validator_ray.functions.op_queries import mg_partial

    rng = np.random.default_rng(7)
    vocab = np.array([f"t{i}" for i in range(10_000)], dtype=object)
    # zipf-ish: a few heavy items + a long uniform tail
    heavy = rng.choice(50, size=20_000) + 0  # ids 0..49, ~400 each
    tail = rng.choice(10_000, size=20_000)  # ~2 each
    stream = np.concatenate([heavy, tail])
    rng.shuffle(stream)
    C = 64
    merged_t = np.array([], dtype=object)
    merged_c = np.array([], dtype=np.int64)
    for block in np.array_split(stream, 16):  # simulate per-batch partials
        ids, cnt = np.unique(block, return_counts=True)
        t, c = mg_partial(vocab[ids], cnt.astype(np.int64), C)
        both_t = np.concatenate([merged_t, t])
        both_c = np.concatenate([merged_c, c])
        u, inv = np.unique(both_t, return_inverse=True)
        acc = np.zeros(len(u), dtype=np.int64)
        np.add.at(acc, inv, both_c)
        merged_t, merged_c = mg_partial(u, acc, C)
    true_ids, true_cnt = np.unique(stream, return_counts=True)
    n = len(stream)
    must_survive = set(vocab[true_ids[true_cnt > n // (C + 1)]].tolist())
    assert must_survive <= set(merged_t.tolist())
    assert len(merged_t) <= C


def test_shard_balance_gap_bounded(ray_session):
    """Longest-first round-robin sharding: the worst shard-total gap is
    bounded by one maximum-length document, and shards hold equal doc
    counts up to one."""
    from seronet_data_validator_ray.pipelines.seq_queries import REGISTRY

    t = REGISTRY["seq_shard_balance"][0](SF).to_pandas()
    assert len(t) == 16
    assert t.sum_tok.max() - t.sum_tok.min() <= t.max_tok.max()
    assert t.n_docs.max() - t.n_docs.min() <= 1


def test_events_anomaly_exact_boundary(ray_session, tmp_path):
    """z^2 == 9 exactly must NOT flag (strict >), z^2 just above must.
    Construction: k zeros + one value a gives, for the outlier,
    (a*n - a)^2 vs 9*(n*a^2 - a^2) -> (n-1)^2 vs 9*(n-1): equality at n=10,
    flag at n=11. This drives the float guard band into the exact-int
    recheck path on the n=10 boundary row."""
    import pyarrow as pa

    from seronet_data_validator_ray.pipelines.table_queries import events_anomaly

    rows = []
    eid = 0
    for typ, zeros in (("edge10", 9), ("edge11", 10)):
        for _ in range(zeros):
            rows.append((eid, typ, 0.0))
            eid += 1
        rows.append((eid, typ, 5.0))
        eid += 1
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "event_type": pa.array([r[1] for r in rows], type=pa.string()),
            "value": pa.array([r[2] for r in rows], type=pa.float64()),
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))
    out = events_anomaly(str(tmp_path)).to_pandas()
    assert set(out["event_type"]) == {"edge11"}, out
    assert out["cents"].tolist() == [500]


def test_docs_ttr_degenerate_split_semantics(ray_session, tmp_path):
    """TTR must follow split(' ') semantics exactly: consecutive spaces make
    empty-string words, repeats collapse in n_types, single word -> 10000 bp."""
    import pyarrow as pa

    from seronet_data_validator_ray.functions.op_queries import docs_ttr

    texts = {
        1: "a b a b a",      # 5 words, 2 types
        2: "a  b",           # 3 words ('a','','b'), 3 types
        3: "solo",           # 1 word
        4: "",               # filtered out
        5: None,             # filtered out
        6: "x x x x",        # 4 words, 1 type
    }
    t = pa.table(
        {
            "doc_id": pa.array(list(texts), type=pa.int64()),
            "text": pa.array(list(texts.values()), type=pa.string()),
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "documents.parquet"))
    out = docs_ttr(str(tmp_path)).to_pandas().set_index("doc_id").sort_index()
    assert out.index.tolist() == [1, 2, 3, 6]
    assert out.loc[1, "n_words"] == 5 and out.loc[1, "n_types"] == 2
    assert out.loc[1, "ttr_bp"] == 2 * 10000 // 5
    assert out.loc[2, "n_words"] == 3 and out.loc[2, "n_types"] == 3
    assert out.loc[3, "ttr_bp"] == 10000
    assert out.loc[6, "n_words"] == 4 and out.loc[6, "n_types"] == 1


def test_wau_and_retention_exchange_paths_match_driver(ray_session, monkeypatch):
    """Force the raw-Ray bucketed exchange (driver_max_rows=0) for the two
    day-window queries and require bit-identical output to the (oracle-
    checked) driver reduce — multi-bucket summing of per-day partials is the
    part sf0.01 parity alone doesn't exercise."""
    from seronet_data_validator_ray.functions import dedup
    from seronet_data_validator_ray.pipelines.table_queries import events_retention, events_wau

    small_w = events_wau(SF).to_pandas()
    small_r = events_retention(SF).to_pandas()
    monkeypatch.setattr(dedup, "EXCHANGE_DRIVER_MAX_ROWS", 0)
    big_w = events_wau(SF).to_pandas()
    big_r = events_retention(SF).to_pandas()
    assert small_w.equals(big_w)
    assert small_r.equals(big_r)


def test_asof_join_exchange_path_matches_driver(ray_session):
    """events_asof_join through the forced user-hash bucketed exchange
    (driver_max_rows=0) must equal the driver-reduce path row-for-row —
    the multi-bucket routing (both sides of one user meeting in one
    reducer) is what sf0.01 driver-path parity alone doesn't exercise."""
    from seronet_data_validator_ray.pipelines.table_queries import events_asof_join

    cols = ["event_id", "ts_us", "click_id", "click_ts_us"]
    small = events_asof_join(SF).to_pandas().sort_values(cols).reset_index(drop=True)
    big = (
        events_asof_join(SF, driver_max_rows=0)
        .to_pandas()
        .sort_values(cols)
        .reset_index(drop=True)
    )
    assert len(small) > 0
    assert small.equals(big)


def test_minhash_incremental_union_parity(ray_session):
    """dedup_minhash_incremental (new shard vs the prior corpus' persisted
    band keys) must equal minhash_lsh_pairs on the UNION corpus restricted to
    pairs touching >= 1 new-side doc — bucket keys depend only on signatures,
    identical in both runs. Also forces the exchange + sided hot-bucket
    salting path and requires bit-identical output."""
    from seronet_data_validator_ray.functions import dedup
    from seronet_data_validator_ray.functions.op_queries import dedup_minhash_incremental

    cols = ["doc_id_a", "doc_id_b", "jac_bp"]
    inc = dedup_minhash_incremental(SF).to_pandas()[cols]
    inc = inc.sort_values(cols).reset_index(drop=True)
    assert len(inc) > 0
    full = dedup.minhash_lsh_pairs(SF).to_pandas()
    m = (full.doc_id_a % 3 != 0) | (full.doc_id_b % 3 != 0)
    union_restricted = full[m][cols].sort_values(cols).reset_index(drop=True)
    assert inc.equals(union_restricted)
    # prior-prior pairs exist in the union run and are correctly absent here
    assert (~m).sum() > 0
    salted = dedup_minhash_incremental(SF, hot_rows=64, driver_max_rows=0).to_pandas()[cols]
    assert inc.equals(salted.sort_values(cols).reset_index(drop=True))


def test_minhash_incremental_two_phase_plan_matches(ray_session, monkeypatch):
    """Force the sparse (signature-resident) plan — bitset budget 0, so
    the sided reducers emit LIGHT candidates and exact verify runs against
    the candidate-sized pruned fetch — and require bit-identical output to
    the dense in-reducer-verify plan."""
    from seronet_data_validator_ray.functions import dedup
    from seronet_data_validator_ray.functions.op_queries import dedup_minhash_incremental

    cols = ["doc_id_a", "doc_id_b", "jac_bp"]
    dense = dedup_minhash_incremental(SF).to_pandas()[cols]
    dense = dense.sort_values(cols).reset_index(drop=True)
    monkeypatch.setattr(dedup, "BITSET_BYTES_MAX", 0)
    sparse = dedup_minhash_incremental(SF).to_pandas()[cols]
    assert dense.equals(sparse.sort_values(cols).reset_index(drop=True))


def test_funnel_exchange_path_matches_driver(ray_session):
    """events_funnel through the forced user-hash bucketed exchange
    (driver_max_rows=0) must equal the driver-reduce path row-for-row —
    the multi-bucket routing (all of one user's views and purchases meeting
    in one reducer) is what sf0.01 driver-path parity alone doesn't
    exercise."""
    from seronet_data_validator_ray.pipelines.table_queries import events_funnel

    small = events_funnel(SF).to_pandas()
    big = events_funnel(SF, driver_max_rows=0).to_pandas()
    assert len(small) > 0
    assert (small["n_converted"] <= small["n_purchases"]).all()
    assert small.equals(big)


def test_funnel_window_edges(ray_session, tmp_path):
    """Planted fixture driving the window boundaries: a view exactly at
    p.ts counts (inclusive upper), exactly at p.ts - 1h does NOT (strict
    lower), one microsecond inside does, and a view AFTER the purchase never
    counts. Users with only views emit no row."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from seronet_data_validator_ray.pipelines.table_queries import events_funnel

    H = 3_600_000_000
    base = 1_700_000_000_000_000
    rows = [
        # user 1: view at p.ts (counts) -> converted
        (1, "view", base), (1, "purchase", base),
        # user 2: view exactly 1h before (strict lower bound -> NOT counted)
        (2, "view", base - H), (2, "purchase", base),
        # user 3: view 1h - 1us before (inside window) -> converted
        (3, "view", base - H + 1), (3, "purchase", base),
        # user 4: view after the purchase -> not converted
        (4, "purchase", base), (4, "view", base + 1),
        # user 5: views only -> no output row
        (5, "view", base),
        # user 6: two purchases, one converted
        (6, "view", base), (6, "purchase", base + 1), (6, "purchase", base + H + 2),
        # noise type filtered at the emit
        (1, "click", base),
    ]
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), type=pa.int64()),
            "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "event_type": pa.array([r[1] for r in rows], type=pa.string()),
            "ts": pa.array([r[2] for r in rows], type=pa.timestamp("us")),
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))
    out = events_funnel(str(tmp_path)).to_pandas().set_index("user_id")
    assert out.index.tolist() == [1, 2, 3, 4, 6]
    assert out.loc[1, "n_converted"] == 1
    assert out.loc[2, "n_converted"] == 0
    assert out.loc[3, "n_converted"] == 1
    assert out.loc[4, "n_converted"] == 0
    assert out.loc[6, "n_purchases"] == 2 and out.loc[6, "n_converted"] == 1


def test_group_median_degenerate_distributions(ray_session, tmp_path):
    """percentile_disc(0.5) rank rule (sorted[(n-1)//2]) on single-row,
    all-equal, even- and odd-count groups."""
    import pyarrow as pa

    from seronet_data_validator_ray.pipelines.table_queries import orders_median_by_priority

    groups = {
        "solo": [7.00],
        "equal": [3.00, 3.00, 3.00, 3.00],
        "even": [1.00, 2.00, 3.00, 4.00],
        "odd": [10.0, 30.0, 20.0, 50.0, 40.0],
    }
    rows = [(p, v) for p, vs in groups.items() for v in vs]
    t = pa.table(
        {
            "o_orderpriority": pa.array([r[0] for r in rows], type=pa.string()),
            "o_totalprice": pa.array([r[1] for r in rows], type=pa.float64()),
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "orders.parquet"))
    out = orders_median_by_priority(str(tmp_path)).to_pandas().set_index("o_orderpriority")
    expect = {
        p: sorted(int(round(v * 100)) for v in vs)[(len(vs) - 1) // 2]
        for p, vs in groups.items()
    }
    for p, med in expect.items():
        assert out.loc[p, "median_cents"] == med, (p, out.loc[p].to_dict())
        assert out.loc[p, "n"] == len(groups[p])


def test_media_resize_payload_reference():
    """Byte-exact check of the nearest-neighbor byte sampling against a
    straightforward Python reference (the part the SQL metadata oracle
    cannot see)."""
    import struct

    import pyarrow as pa

    from seronet_data_validator_ray.functions.media import (
        _MAGIC,
        MediaResizer,
        encode_fake_media_batch,
    )

    texts = ["hello world", "x" * 200, "a", "The quick brown fox jumps over the lazy dog"]
    batch = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    media = encode_fake_media_batch(batch)
    out = MediaResizer()(media)
    for payload, resized in zip(media["payload"].to_pylist(), out["payload"].to_pylist()):
        w, h, frames = struct.unpack("<III", payload[8:20])
        body = payload[20:]
        w2, h2 = min(w, 32), min(h, 32)
        out_len = (len(body) * w2 * h2) // (w * h)
        expect = bytes(body[(i * len(body)) // out_len] for i in range(out_len))
        assert resized == _MAGIC + struct.pack("<III", w2, h2, frames) + expect


def test_events_null_contracts_match_oracle(ray_session, tmp_path):
    """Null user_id/ts/event_type/value rows must follow the contract stated
    in each oracle SQL (explicit IS NOT NULL filters) instead of silently
    corrupting numpy dedup via NaN promotion — checked by running the actual
    DuckDB oracle over a null-bearing events table."""
    import duckdb
    import pandas as pd
    import pyarrow as pa

    from seronet_data_validator_ray.pipelines.table_queries import REGISTRY

    n = 300
    rng = np.random.default_rng(5)
    base = pd.Timestamp("2024-01-01").value // 1000  # us
    ts = [base + int(d) * 86_400_000_000 for d in rng.integers(0, 20, n)]
    user = rng.integers(0, 12, n).tolist()
    etype = rng.choice(["click", "view", "error"], n).astype(object)
    value = rng.normal(50.0, 10.0, n).tolist()
    # plant Arrow NULLs in every column the events queries touch
    user[:7] = [None] * 7
    etype[7:12] = None
    value[12:18] = [None] * 6
    ts = [None] * 4 + ts[4:]
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n), type=pa.int64()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
            "user_id": pa.array(user, type=pa.int64()),
            "event_type": pa.array(etype.tolist(), type=pa.string()),
            "value": pa.array(value, type=pa.float64()),
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
    )
    for name in ("events_wau", "events_retention", "events_anomaly", "events_impute"):
        fn, sql = REGISTRY[name]
        got = fn(str(tmp_path)).to_pandas()
        want = con.execute(sql).df()
        cols = sorted(got.columns)
        assert cols == sorted(want.columns), name
        a = got[cols].sort_values(cols).reset_index(drop=True)
        b = want[cols].sort_values(cols).reset_index(drop=True).astype(a.dtypes.to_dict())
        pd.testing.assert_frame_equal(a, b, check_dtype=False), name


def test_events_impute_all_error_degenerate(ray_session, tmp_path):
    """When every valid-valued event is 'error' the mean is undefined: the
    engine must emit NULL cents_filled rows (was_imputed=true), exactly like
    the SQL oracle — not raise ZeroDivisionError."""
    import duckdb
    import pandas as pd
    import pyarrow as pa

    from seronet_data_validator_ray.pipelines.table_queries import REGISTRY

    n = 50
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n), type=pa.int64()),
            "event_type": pa.array(["error"] * n, type=pa.string()),
            "value": pa.array(np.linspace(1.0, 9.0, n), type=pa.float64()),
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))
    fn, sql = REGISTRY["events_impute"]
    got = fn(str(tmp_path)).to_pandas()
    assert len(got) == n
    assert got["was_imputed"].all()
    assert got["cents_filled"].isna().all()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
    )
    want = con.execute(sql).df()
    cols = sorted(got.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_dedup_exact_digest_survives_hash_collisions(ray_session):
    """Force massive digest collisions (hash = text byte length) and require
    the digest-mode plan to still produce exactly the raw-text grouping:
    the candidate-verify pass must split colliding digests by true text."""
    import numpy as np
    import pyarrow as pa

    from seronet_data_validator_ray.functions.op_queries import REGISTRY, dedup_exact_digest

    def weak_hash(col: pa.ChunkedArray) -> np.ndarray:
        lens = np.array([len(t.encode()) for t in col.to_pylist()], dtype=np.uint64)
        return lens  # .view(np.int64) applied by the caller

    collided = (
        dedup_exact_digest(SF, hash_fn=weak_hash)
        .to_pandas().sort_values("keep_doc_id").reset_index(drop=True)
    )
    true = (
        REGISTRY["dedup_exact"][0](SF)
        .to_pandas().sort_values("keep_doc_id").reset_index(drop=True)
    )
    cols = sorted(true.columns)
    assert collided[cols].equals(true[cols])
    # the weak hash genuinely collides (fewer distinct lengths than texts)
    assert len(set(weak_hash(pa.chunked_array([pa.array(true["text"])])))) < len(true)


def test_dedup_semantic_clusters_structure(ray_session):
    """Cosine keep-list mirrors the MinHash keep-list invariants: every
    paired vector appears, reps are component minima, one keep per cluster,
    and pair endpoints always share a cluster."""
    from seronet_data_validator_ray.functions import ann
    from seronet_data_validator_ray.functions.op_queries import REGISTRY

    clusters = REGISTRY["dedup_semantic_clusters"][0](SF).to_pandas()
    pairs = ann.cosine_near_dup_ivf(SF).to_pandas()
    paired = set(pairs.vec_id_a) | set(pairs.vec_id_b)
    assert set(clusters.vec_id) == paired
    assert (clusters.cluster_size >= 2).all()
    byrep = clusters.groupby("cluster_rep")
    assert (byrep["keep"].sum() == 1).all()
    for rep, g in byrep:
        assert rep == g.vec_id.min()
        assert len(g) == g.cluster_size.iloc[0]
    rep_of = dict(zip(clusters.vec_id, clusters.cluster_rep))
    assert all(rep_of[a] == rep_of[b] for a, b in zip(pairs.vec_id_a, pairs.vec_id_b))


def test_empty_corpus_raises_named_error(ray_session):
    """An all-empty input table must fail EARLY with a named error (Ray Data
    never invokes UDFs on zero-row inputs, so without the guard the failure
    is an opaque schema-less KeyError deep in the pipeline). Mid-pipeline
    empty BATCHES — filters, empty partitions among non-empty ones — remain
    fully supported (validate() on a mixed dir is tested in test_pipeline)."""
    import os

    import pyarrow.parquet as pq
    import pytest

    from seronet_data_validator_ray.functions.op_queries import REGISTRY as OPS
    from seronet_data_validator_ray.pipelines.table_queries import REGISTRY as TBL

    d = "/tmp/graft_empty_sf_test"
    os.makedirs(d, exist_ok=True)
    for t in ("documents", "events", "embeddings", "lineitem", "orders"):
        schema = pq.read_schema(f"/root/testdata/sf0.001/{t}.parquet")
        pq.write_table(schema.empty_table(), os.path.join(d, f"{t}.parquet"))
    for name in ("dedup_exact", "events_wau", "pricing_summary",
                 "cosine_near_dup_ivf", "media_frames", "docs_sample_topk_hash"):
        fn = (OPS.get(name) or TBL.get(name))[0]
        with pytest.raises(ValueError, match="is empty"):
            fn(d)


def test_combiner_queries_block_invariant(ray_session):
    """Per-batch-combiner queries must be bit-identical under radically
    different block boundaries — the partial-merge bug class (a combiner
    that only works when all rows of a key share a batch) cannot hide from
    a 64 KiB block size."""
    from ray.data import DataContext

    import __ray_entry__ as e

    qs = e.queries()
    names = [
        "pricing_summary", "events_value_histogram", "orders_yoy",
        "events_wau", "events_retention", "events_anomaly",
        "docs_sample_topk_hash", "stats_lineitem",
        # round-4 continuation combiner/exchange shapes
        "docs_quota_sample", "customer_mode_segment", "events_mad_outliers",
        "part_pareto_frontier", "events_cumulative_users", "events_top_paths",
        "docs_vocab_encode", "seq_dedup_tokens",
        # round-5 sort+scalar-prefix shapes (the per-block base-offset bug
        # class — an emit that only works when the sort yields one block —
        # cannot hide from 64 KiB blocks)
        "docs_epoch_shuffle", "docs_split_assign", "customer_rfm",
    ]
    sf = "/root/testdata/sf0.001"
    base = {n: qs[n](sf).to_pandas() for n in names}
    ctx = DataContext.get_current()
    saved = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 64 * 1024
        tiny = {n: qs[n](sf).to_pandas() for n in names}
    finally:
        ctx.target_max_block_size = saved
    for n in names:
        a, b = base[n], tiny[n]
        cols = sorted(a.columns)
        aa = a[cols].sort_values(cols).reset_index(drop=True)
        bb = b[cols].sort_values(cols).reset_index(drop=True)
        assert aa.equals(bb), n


def test_edit_distance_exchange_and_chunked_verify_match_driver(ray_session, monkeypatch):
    """Force the scale paths — raw-Ray bucketed candidate exchange AND
    multi-chunk remote verify tasks — and require bit-identical output to
    the (oracle-checked) driver path."""
    import ray.data

    from seronet_data_validator_ray.functions import dedup

    docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    small = dedup.edit_distance_pairs(docs)
    assert small.num_rows > 0, "fixture should contain blocked near-dup pairs"
    monkeypatch.setattr(dedup, "EXCHANGE_DRIVER_MAX_ROWS", 0)
    monkeypatch.setattr(dedup, "EDIT_VERIFY_CHUNK", 4)
    big = dedup.edit_distance_pairs(docs)
    assert small.to_pandas().equals(big.to_pandas())


def test_semi_bloom_false_positives_removed(ray_session, monkeypatch):
    """Shrink the bloom to 64 bits (massive false-positive rate on thousands
    of keys) and require the output unchanged: the co-partitioned exact join
    must remove every bloom false positive, so the bitmap size is purely a
    shuffle-volume knob, never a correctness one."""
    from seronet_data_validator_ray.pipelines import table_queries as tq

    base = tq.REGISTRY["lineitem_semi_bloom"][0](SF).to_pandas()
    monkeypatch.setattr(tq, "BLOOM_LOG2_BITS", 6)
    fp_heavy = tq.REGISTRY["lineitem_semi_bloom"][0](SF).to_pandas()
    assert base.equals(fp_heavy)


def test_token_dedup_groups_dups_collisions_and_exchange(ray_session, monkeypatch):
    """token_dedup_groups on a crafted corpus with planted duplicate arrays,
    a null-tokens row, an empty-array row and an empty doc_id: the default
    hash, a deliberately COLLIDING hash (every row same digest — the verify
    must split groups by true content), and the forced raw-Ray exchange path
    must all reproduce the brute-force grouping."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from seronet_data_validator_ray.functions import dedup

    rows = {
        "doc_id": ["d3", "d1", "d2", "d4", "", "d5", "d6", "d7"],
        "tokens": [
            [1, 2, 3],
            [1, 2, 3],          # dup of d3's array, smaller id wins
            [3, 2, 1],          # same multiset, different order: distinct
            [1, 2],             # prefix: distinct
            [9, 9],             # empty doc_id: dropped by contract
            None,               # null tokens: dropped by contract
            [],                 # empty array is a REAL group (not null)
            [7],
        ],
    }
    tbl = pa.table(
        {
            "doc_id": pa.array(rows["doc_id"], type=pa.string()),
            "tokens": pa.array(rows["tokens"], type=pa.list_(pa.int32())),
        }
    )
    want = sorted(
        [("d1", 2, 3), ("d2", 1, 3), ("d4", 1, 2), ("d6", 1, 0), ("d7", 1, 1)]
    )

    def got_tuples(out):
        t = out.to_pandas()
        return sorted(zip(t.keep_doc_id, t.n_copies, t.n_tok))

    ds = ray.data.from_arrow(tbl)
    assert got_tuples(dedup.token_dedup_groups(ds)) == want

    def colliding(batch, col="tokens"):
        return np.full(batch.num_rows, 0xABCD, dtype=np.uint64)

    assert got_tuples(dedup.token_dedup_groups(ds, hash_fn=colliding)) == want

    monkeypatch.setattr(dedup, "EXCHANGE_DRIVER_MAX_ROWS", 0)
    assert got_tuples(dedup.token_dedup_groups(ds)) == want


def test_new_exchange_queries_forced_path_matches_driver(ray_session, monkeypatch):
    """events_cumulative_users, events_top_paths and supplier_part_coverage
    ride the shared bucketed exchange: forcing EXCHANGE_DRIVER_MAX_ROWS=0
    (every reduce through the raw-Ray split/reduce path) must be
    bit-identical to the driver-reduce path for all three."""
    from seronet_data_validator_ray.functions import dedup
    from seronet_data_validator_ray.functions import op_queries as oq
    from seronet_data_validator_ray.pipelines import table_queries as tq

    reg = {**tq.REGISTRY, **oq.REGISTRY}
    names = [
        "events_cumulative_users",
        "events_top_paths",
        "supplier_part_coverage",
        "docs_source_overlap",
    ]
    small = {n: reg[n][0](SF).to_pandas() for n in names}
    monkeypatch.setattr(dedup, "EXCHANGE_DRIVER_MAX_ROWS", 0)
    for n in names:
        big = reg[n][0](SF).to_pandas()
        assert small[n].equals(big), n
