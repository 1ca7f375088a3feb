"""Training-data pipeline operators (dedup / similarity / text / events /
multimodal) over the sf0.001 testdata."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False
    yield


def test_doc_stats_counts(ray_session):
    from linkinator_ray.pipelines.text import doc_stats
    df = doc_stats(SF).to_pandas()
    assert len(df) == 500
    assert (df["n_tokens"] > 0).all()
    assert set(df.columns) == {"doc_id", "n_tokens", "n_chars", "alpha_ppm",
                               "punct_ppm"}


def test_lang_id_on_planted_corpus(ray_session, tmp_path):
    """The testdata lang column is random metadata (uncorrelated with
    the text), so accuracy is tested on a planted corpus whose text
    actually carries each language's stopwords."""
    import pyarrow.parquet as pq
    from linkinator_ray.pipelines.text import lang_id
    samples = {
        "en": "the cat and the dog ran to the house of a friend in town",
        "de": "der hund und die katze ist ein tier mit dem mann von hier",
        "es": "el perro y la casa de que el gato es un animal no por eso",
        "fr": "le chien est un animal et la maison de que pour dans la rue",
    }
    rows = []
    for i in range(40):
        lang = list(samples)[i % 4]
        rows.append({"doc_id": i, "text": samples[lang] + f" extra{i}",
                     "lang": lang})
    out = tmp_path / "sf"
    out.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(out / "documents.parquet"))
    pred = lang_id(str(out)).to_pandas()
    truth = pd.DataFrame(rows)[["doc_id", "lang"]]
    merged = pred.merge(truth, on="doc_id")
    acc = (merged["predicted_lang"] == merged["lang"]).mean()
    assert acc >= 0.9, acc


def test_dedup_exact_self_consistent(ray_session):
    from linkinator_ray.pipelines.dedup import dedup_exact
    df = dedup_exact(SF).to_pandas()
    assert df["dup_count"].sum() == 500
    assert df["keeper_doc_id"].is_unique


def test_minhash_finds_planted_neardups(ray_session, tmp_path):
    """Plant exact + near duplicates in a copy of the corpus; MinHash+LSH
    must cluster them together."""
    import duckdb
    import pyarrow.parquet as pq
    from linkinator_ray.pipelines.dedup import dedup_minhash
    base = duckdb.sql(
        f"SELECT doc_id, text, lang, source, n_chars FROM '{SF}/documents.parquet' LIMIT 50"
    ).arrow()
    rows = base.to_pylist()
    next_id = 10_000
    planted = []
    for src in rows[:5]:
        dup = dict(src)
        dup["doc_id"] = next_id
        words = src["text"].split()
        words[0] = "zzz"  # near-dup: one token changed
        dup["text"] = " ".join(words)
        planted.append((src["doc_id"], next_id))
        rows.append(dup)
        next_id += 1
    out_dir = tmp_path / "sf"
    out_dir.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(out_dir / "documents.parquet"))
    clusters = dedup_minhash(str(out_dir), threshold=0.5).to_pandas()
    cluster_of = dict(zip(clusters["doc_id"], clusters["cluster_id"]))
    for orig, dup in planted:
        assert orig in cluster_of and dup in cluster_of, (orig, dup)
        assert cluster_of[orig] == cluster_of[dup]
    # partitioned verify (no driver anchor maps) must produce the
    # identical cluster table — both modes share banding + threshold
    part = dedup_minhash(str(out_dir), threshold=0.5,
                         verify="partitioned").to_pandas()
    assert part.values.tolist() == clusters.values.tolist()
    # distributed clustering (large-star/small-star over the verified
    # pairs — no driver union-find) must agree with the driver path
    dist = dedup_minhash(str(out_dir), threshold=0.5,
                         cluster="distributed").to_pandas() \
        .sort_values(["doc_id", "cluster_id"]).reset_index(drop=True)
    assert dist.values.tolist() == clusters.values.tolist()


def test_shingle_flat_matches_per_doc():
    """The flat batched shingle/signature kernel must be bit-identical
    to the per-doc reference path across edge cases (empty, whitespace,
    shorter-than-ngram, repeated-token docs)."""
    import duckdb
    from linkinator_ray.pipelines.dedup import (MinHasher, _shingle_flat,
                                                _shingle_hashes)
    texts = duckdb.sql(
        f"SELECT text FROM '{SF}/documents.parquet' LIMIT 100").df()[
        "text"].tolist()
    cases = texts + ["", "   ", "one", "one two", "one two three",
                     "a a a a", "\t\n"]
    ref = [_shingle_hashes(t or "", 3) for t in cases]
    vals, offsets = _shingle_flat(cases, 3)
    for i in range(len(cases)):
        assert np.array_equal(vals[offsets[i]:offsets[i + 1]], ref[i]), i
    h = MinHasher(64, 3)
    assert np.array_equal(h.signatures_from_shingle_lists(ref),
                          h.signatures_batch(cases))


def test_simhash_exact_dup_distance_zero(ray_session):
    from linkinator_ray.pipelines.dedup import SimHasher
    h = SimHasher()
    a = h.simhash("the quick brown fox jumps over the lazy dog")
    b = h.simhash("the quick brown fox jumps over the lazy dog")
    c = h.simhash("completely different words entirely here now")
    assert a == b
    assert bin(a ^ c).count("1") > 8


def test_simhash_distributed_cluster_matches_driver(ray_session, tmp_path):
    """Plant near-identical docs; the distributed clustering tail
    (large-star/small-star over the verified pairs) must produce the
    SAME (doc_id, cluster_id) table as the driver union-find, and both
    must cluster the planted dups."""
    import duckdb
    import pyarrow.parquet as pq
    from linkinator_ray.pipelines.dedup import dedup_simhash
    base = duckdb.sql(
        f"SELECT doc_id, text, lang, source, n_chars "
        f"FROM '{SF}/documents.parquet' LIMIT 50").arrow()
    rows = base.to_pylist()
    next_id = 20_000
    planted = []
    for src in rows[:5]:
        dup = dict(src)
        dup["doc_id"] = next_id
        dup["text"] = src["text"]  # exact dup: simhash distance 0
        planted.append((src["doc_id"], next_id))
        rows.append(dup)
        next_id += 1
    out_dir = tmp_path / "sf"
    out_dir.mkdir()
    pq.write_table(pa.Table.from_pylist(rows),
                   str(out_dir / "documents.parquet"))
    drv = dedup_simhash(str(out_dir), 3, cluster="driver").to_pandas() \
        .sort_values(["doc_id", "cluster_id"]).reset_index(drop=True)
    dist = dedup_simhash(str(out_dir), 3, cluster="distributed") \
        .to_pandas().sort_values(["doc_id", "cluster_id"]) \
        .reset_index(drop=True)
    assert drv.astype("int64").values.tolist() == \
        dist.astype("int64").values.tolist()
    cluster_of = dict(zip(drv["doc_id"], drv["cluster_id"]))
    for orig, dup in planted:
        assert cluster_of.get(orig) == cluster_of.get(dup) is not None


def test_simhash_bucket_pairs_recall():
    """The recall case anchor pairing LOSES: a bucket whose min doc is
    an unrelated 16-bit collision (ham > max) between two true
    near-dups. All-pairs must emit (b, c); the capped fallback reverts
    to anchor-star and misses it (documented trade)."""
    from linkinator_ray.pipelines.dedup import _simhash_bucket_pairs
    sh_b = np.uint64(0x1234)                        # band 0 = 0x1234
    sh_c = sh_b | (np.uint64(3) << np.uint64(60))   # ham(b,c)=2
    sh_a = sh_b | (np.uint64(0xFFFFFF) << np.uint64(32))  # ham(a,·)≫3
    part = pd.DataFrame({
        "band_id": [0, 0, 0],
        "band_hash": [0x1234] * 3,
        "doc_id": [1, 2, 3],                        # anchor = unrelated 1
        "simhash": np.array([sh_a, sh_b, sh_c], dtype=np.uint64),
    })
    pairs = _simhash_bucket_pairs(part, max_hamming=3, bucket_cap=512)
    assert [(2, 3)] == list(zip(pairs["a"], pairs["b"]))
    # capped bucket falls back to anchor-star and loses the pair
    capped = _simhash_bucket_pairs(part, max_hamming=3, bucket_cap=2)
    assert len(capped) == 0


def test_minhash_auto_threshold_both_ways(ray_session):
    """The hot-bucket auto-switch must produce identical clusters
    whether it resolves to broadcast+driver (threshold above the hot
    count) or partitioned+distributed (threshold forced to 0)."""
    from linkinator_ray.pipelines.dedup import dedup_minhash

    def norm(x):
        df = x.to_pandas() if hasattr(x, "to_pandas") else x
        if hasattr(df, "to_pandas"):  # pyarrow Table
            df = df.to_pandas()
        return df.sort_values(["doc_id", "cluster_id"]) \
            .reset_index(drop=True).astype("int64").values.tolist()

    low = dedup_minhash(SF, threshold=0.7, hot_bucket_threshold=10**9)
    high = dedup_minhash(SF, threshold=0.7, hot_bucket_threshold=0)
    assert norm(low) == norm(high)


def test_minhash_pair_bound_auto_switch(ray_session, tmp_path):
    """A pair-bomb corpus (one text duplicated N times = few hot
    buckets but ~N candidate pairs) must auto-route to the
    partitioned+distributed path once the PAIR bound exceeds the
    threshold — and still cluster every copy together."""
    import pyarrow.parquet as pq
    from linkinator_ray.pipelines.dedup import dedup_minhash
    n = 300
    rows = [{"doc_id": i, "text": "the same boilerplate text in every doc"}
            for i in range(n)]
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
    # few hot buckets (16) but ~299 pairs > 100 ⇒ partitioned+distributed
    out = dedup_minhash(str(d), threshold=0.7, hot_bucket_threshold=100)
    assert not isinstance(out, pa.Table)  # Dataset ⇒ distributed tail ran
    df = out.to_pandas()
    assert len(df) == n
    assert set(df["cluster_id"]) == {0}
    # forced broadcast on the same corpus agrees exactly
    bc = dedup_minhash(str(d), threshold=0.7, verify="broadcast",
                       cluster="driver").to_pandas()
    assert df.sort_values("doc_id").values.tolist() == \
        bc.sort_values("doc_id").values.tolist()


def test_knn_bruteforce_self_nearest(ray_session):
    from linkinator_ray.pipelines.similarity import knn_bruteforce
    df = knn_bruteforce(SF, k=5, num_queries=3).to_pandas()
    top = df[df["rank"] == 1]
    assert (top["neighbor_id"].to_numpy() == top["query_id"].to_numpy()).all()
    assert np.allclose(top["cosine"], 1.0, atol=1e-6)


def test_knn_lsh_recall(ray_session):
    """Uniform-random embeddings are LSH's worst case; with coarse
    buckets (2 planes) recall vs brute force should still be real."""
    from linkinator_ray.pipelines.similarity import knn_bruteforce, knn_lsh
    exact = knn_bruteforce(SF, k=5, num_queries=4).to_pandas()
    approx = knn_lsh(SF, k=5, num_queries=4, n_planes=2).to_pandas()
    exact_sets = exact.groupby("query_id")["neighbor_id"].apply(set)
    approx_sets = approx.groupby("query_id")["neighbor_id"].apply(set)
    recalls = []
    for qid in exact_sets.index:
        got = approx_sets.get(qid, set())
        recalls.append(len(got & exact_sets[qid]) / len(exact_sets[qid]))
    assert np.mean(recalls) >= 0.3, recalls  # approximate, but not useless


def test_tumbling_window_totals(ray_session):
    import duckdb
    from linkinator_ray.pipelines.events import tumbling_window
    df = tumbling_window(SF, 3600).to_pandas()
    total = duckdb.sql(f"SELECT count(*) n FROM '{SF}/events.parquet'").df()["n"][0]
    assert df["n_events"].sum() == total


def test_sessionize_event_conservation(ray_session):
    import duckdb
    from linkinator_ray.pipelines.events import sessionize
    df = sessionize(SF, 1800).to_pandas()
    total = duckdb.sql(f"SELECT count(*) n FROM '{SF}/events.parquet'").df()["n"][0]
    assert df["n_events"].sum() == total
    assert (df["n_sessions"] >= 1).all()
    assert (df["max_session_events"] <= df["n_events"]).all()


def test_sessionize_matches_sql_and_partition_invariant(ray_session):
    """The segmented-numpy kernel must equal the SQL window-function
    definition exactly, independent of how many hash partitions the
    events land in (per-user co-location is the only requirement)."""
    import duckdb
    from linkinator_ray.pipelines.events import read_events, sessionize
    from linkinator_ray.pipelines.hashagg import hash_partition_apply
    want = duckdb.sql(f"""
        WITH gaps AS (
            SELECT user_id, ts,
                   CASE WHEN epoch_us(ts) // 1000000
                             - epoch_us(lag(ts) OVER w) // 1000000 > 1800
                        THEN 1 ELSE 0 END AS new_sess
            FROM '{SF}/events.parquet'
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), sess AS (
            SELECT user_id,
                   sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS sess_id FROM gaps
        ), sizes AS (SELECT user_id, sess_id, count(*) AS sz
                     FROM sess GROUP BY user_id, sess_id)
        SELECT user_id, count(*)::BIGINT AS n_sessions,
               max(sz)::BIGINT AS max_session_events,
               sum(sz)::BIGINT AS n_events
        FROM sizes GROUP BY user_id ORDER BY user_id""").df()
    for parts in (1, 7):
        got = sessionize(SF, 1800, num_parts=parts).to_pandas() \
            .sort_values("user_id").reset_index(drop=True)[
                want.columns.tolist()]
        assert got.astype("int64").values.tolist() == \
            want.astype("int64").values.tolist(), parts


def test_daily_active_users_planted(ray_session, tmp_path):
    """Exact count-distinct semantics: a user active twice in one
    window counts once in n_users but twice in n_events; windows split
    at the 86400s boundary."""
    import pyarrow.parquet as pq

    from linkinator_ray.pipelines.events import daily_active_users
    day = 86_400_000_000  # us
    t = pa.table({
        "ts": pa.array([10 * 10**6, 20 * 10**6, day + 5 * 10**6,
                        day + 6 * 10**6, day + 7 * 10**6],
                       pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
    })
    out = tmp_path / "sf"
    out.mkdir()
    pq.write_table(t, str(out / "events.parquet"))
    df = daily_active_users(str(out)).to_pandas() \
        .sort_values("window_start").reset_index(drop=True)
    assert df["window_start"].tolist() == [0, 86400]
    assert df["n_users"].tolist() == [1, 2]
    assert df["n_events"].tolist() == [2, 3]


def test_retention_cohorts_planted(ray_session, tmp_path):
    """Cohort semantics: users cohort by FIRST active day; each
    (cohort, offset) cell counts distinct active users; a user active
    twice on an offset day counts once."""
    import pyarrow.parquet as pq

    from linkinator_ray.pipelines.events import retention_cohorts
    day_us = 86_400_000_000
    # user 1: days 0, 1, 1 (dup), 3 — cohort 0
    # user 2: days 1, 3            — cohort 1
    rows = [(1, 0), (1, 1), (1, 1), (1, 3), (2, 1), (2, 3)]
    t = pa.table({
        "ts": pa.array([d * day_us + u * 10**6 for u, d in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([u for u, _ in rows], pa.int64()),
    })
    out = tmp_path / "sf"
    out.mkdir()
    pq.write_table(t, str(out / "events.parquet"))
    df = retention_cohorts(str(out)).to_pandas() \
        .sort_values(["cohort_start", "day_offset"]).reset_index(drop=True)
    got = list(map(tuple, df[["cohort_start", "day_offset",
                              "n_users"]].to_numpy()))
    assert got == [(0, 0, 1), (0, 1, 1), (0, 3, 1),
                   (86400, 0, 1), (86400, 2, 1)]


def test_media_decoder_plumbing(ray_session):
    from linkinator_ray.pipelines.multimodal import media_features
    df = media_features(SF).to_pandas()
    assert len(df) == 500
    assert set(df["kind"]) == {"image", "audio", "video"}
    videos = df[df["kind"] == "video"]
    assert (videos["n_frames"] == videos["n_bytes"] // 32).all()


def test_media_decode_real_is_gated():
    from linkinator_ray.pipelines.multimodal import decode_real
    with pytest.raises(ValueError):
        decode_real(b"xx", "video")  # video decode is real: bad payload
    with pytest.raises(ValueError):
        decode_real(b"xx", "image")  # image decode is real: bad payload


def _make_png(w: int = 8, h: int = 6, channels: int = 3,
              filters=(0, 1, 2, 3, 4, 0)) -> tuple[bytes, np.ndarray]:
    """Genuine PNG bytes built by hand (header + zlib IDAT + CRCs),
    exercising every scanline filter type on deterministic pixels.
    Returns (payload, raw pixel matrix)."""
    import struct
    import zlib
    ctype = {1: 0, 3: 2, 4: 6}[channels]
    y_idx, x_idx, c_idx = np.meshgrid(
        np.arange(h), np.arange(w), np.arange(channels), indexing="ij")
    raw = ((x_idx * 7 + y_idx * 13 + c_idx * 29) % 256).astype(np.uint8)
    flat = raw.reshape(h, w * channels).astype(np.int64)
    bpp = channels
    stride = w * channels
    lines = bytearray()
    for y in range(h):
        f = filters[y % len(filters)]
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, np.int64)
        if f == 0:
            enc = cur
        elif f == 1:
            left = np.concatenate((np.zeros(bpp, np.int64), cur[:-bpp]))
            enc = (cur - left) % 256
        elif f == 2:
            enc = (cur - prev) % 256
        elif f == 3:
            left = np.concatenate((np.zeros(bpp, np.int64), cur[:-bpp]))
            enc = (cur - (left + prev) // 2) % 256
        else:  # Paeth
            left = np.concatenate((np.zeros(bpp, np.int64), cur[:-bpp]))
            ul = np.concatenate((np.zeros(bpp, np.int64), prev[:-bpp]))
            p = left + prev - ul
            pa_, pb_, pc_ = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where((pa_ <= pb_) & (pa_ <= pc_), left,
                            np.where(pb_ <= pc_, prev, ul))
            enc = (cur - pred) % 256
        lines.append(f)
        lines.extend(enc.astype(np.uint8).tobytes())

    def chunk(typ: bytes, data: bytes) -> bytes:
        return struct.pack(">I", len(data)) + typ + data \
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    payload = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", zlib.compress(bytes(lines)))
               + chunk(b"IEND", b""))
    return payload, raw


@pytest.mark.parametrize("channels", [1, 3, 4])
def test_media_decode_png_real(channels):
    """The REAL image path: a genuine PNG (every filter type exercised)
    decodes to its true dimensions and mean pixel value."""
    from linkinator_ray.pipelines.multimodal import decode_png, decode_real
    payload, raw = _make_png(w=9, h=7, channels=channels)
    f = decode_png(payload)
    assert f["width"] == 9 and f["height"] == 7
    assert f["channels"] == channels
    assert f["n_pixels"] == 63
    assert f["mean_milli"] == int(round(float(raw.mean()) * 1000))
    assert decode_real(payload, "image") == f
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\n" + b"garbage-chunk-stream")


def test_media_decoder_real_png_in_batch(ray_session):
    """MediaDecoder detects a genuine PNG payload inside an image batch
    and emits REAL features (mean pixel in rms_milli, decoded_real
    flag) while stub rows keep the deterministic fake path."""
    from linkinator_ray.pipelines.multimodal import MediaDecoder
    payload, raw = _make_png(w=8, h=6, channels=3)
    stub = b"\x00" * 64
    batch = pa.table({
        "media_id": pa.array([1, 2], pa.int64()),
        "kind": pa.array(["image", "image"], pa.string()),
        "payload": pa.array([payload, stub], pa.binary()),
    })
    out = MediaDecoder(frame_sample_rate=4)(batch).to_pandas()
    real = out[out["media_id"] == 1].iloc[0]
    fake = out[out["media_id"] == 2].iloc[0]
    assert bool(real["decoded_real"]) and not bool(fake["decoded_real"])
    assert real["n_frames"] == 1 and real["sampled_frames"] == 1
    assert real["rms_milli"] == int(round(float(raw.mean()) * 1000))
    assert not fake["decoded_real"] and fake["rms_milli"] == 0


def _make_wav(n_frames: int = 800, rate: int = 8000, freq: float = 440.0):
    """Genuine 16-bit mono PCM WAV bytes (stdlib writer) + its samples."""
    import io
    import wave
    t = np.arange(n_frames) / rate
    samples = (np.sin(2 * np.pi * freq * t) * 12000).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue(), samples


def test_media_decode_wav_real():
    """The REAL audio path: a genuine WAV payload decodes to its true
    frame count / rate / RMS (cross-checked against the raw samples)."""
    from linkinator_ray.pipelines.multimodal import decode_real, decode_wav
    payload, samples = _make_wav()
    f = decode_wav(payload)
    assert f["n_frames"] == len(samples)
    assert f["sample_rate"] == 8000
    assert f["n_channels"] == 1
    assert f["duration_ms"] == len(samples) * 1000 // 8000
    want_rms = int(round(float(np.sqrt(np.mean(
        samples.astype(np.float64) ** 2))) * 1000))
    assert f["rms_milli"] == want_rms
    assert decode_real(payload, "audio") == f
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxWAVEgarbage")


def test_media_decoder_real_wav_in_batch(ray_session):
    """MediaDecoder detects a genuine WAV payload inside a batch and
    emits REAL features for it while stub rows keep the deterministic
    fake path (decoded_real flags which is which)."""
    from linkinator_ray.pipelines.multimodal import MediaDecoder
    payload, samples = _make_wav(n_frames=640)
    stub = b"\x00" * 64
    batch = pa.table({
        "media_id": pa.array([1, 2], pa.int64()),
        "kind": pa.array(["audio", "audio"], pa.string()),
        "payload": pa.array([payload, stub], pa.binary()),
    })
    out = MediaDecoder(frame_sample_rate=4)(batch).to_pandas()
    real = out[out["media_id"] == 1].iloc[0]
    fake = out[out["media_id"] == 2].iloc[0]
    assert bool(real["decoded_real"]) and not bool(fake["decoded_real"])
    assert real["n_frames"] == 640
    assert real["sampled_frames"] == 160
    assert real["rms_milli"] > 0
    assert fake["n_frames"] == 1 and fake["rms_milli"] == 0


def test_rolling_fingerprint_edit_stability(ray_session, tmp_path):
    """Winnowing-style min-hash fingerprint should survive a small tail
    edit on a long doc (content-defined, not position-defined)."""
    from linkinator_ray.pipelines.text import rolling_fingerprint
    import pyarrow.parquet as pq
    words = [f"w{i}" for i in range(200)]
    doc_a = {"doc_id": 1, "text": " ".join(words)}
    doc_b = {"doc_id": 2, "text": " ".join(words + ["tail-extra"])}
    out = tmp_path / "sf"
    out.mkdir()
    pq.write_table(pa.Table.from_pylist([doc_a, doc_b]), str(out / "documents.parquet"))
    df = rolling_fingerprint(str(out)).to_pandas()
    fps = dict(zip(df["doc_id"], df["rolling_fp"]))
    assert fps[1] == fps[2]


def test_quality_filter_bounds(ray_session):
    from linkinator_ray.pipelines.text import quality_filter
    df = quality_filter(SF, min_tokens=20, max_tokens=1000).to_pandas()
    assert (df["n_tokens"] >= 20).all() and (df["n_tokens"] <= 1000).all()
    assert (df["alpha_ppm"] >= 500_000).all()
    assert 0 < len(df) <= 500


def test_top_tokens_deterministic(ray_session):
    from linkinator_ray.pipelines.text import top_tokens
    a = top_tokens(SF, k=10).to_pylist()
    b = top_tokens(SF, k=10).to_pylist()
    assert a == b
    assert len(a) == 10
    freqs = [r["doc_freq"] for r in a]
    assert freqs == sorted(freqs, reverse=True)


def test_sliding_window_covers_tumbling(ray_session):
    from linkinator_ray.pipelines.events import sliding_window, tumbling_window
    slide = sliding_window(SF, 7200, 3600).to_pandas()
    tumble = tumbling_window(SF, 3600).to_pandas()
    # every event lands in exactly 2 sliding windows
    assert slide["n_events"].sum() == 2 * tumble["n_events"].sum()


def test_dedup_embedding_lsh_finds_planted(ray_session, tmp_path):
    """Plant a near-identical vector; the LSH-bucketed near-dup must
    pair it with its source (same bucket by construction)."""
    import pyarrow.parquet as pq
    from linkinator_ray.pipelines.dedup import dedup_embedding_lsh
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((100, 64)).astype(np.float32)
    dup = vecs[3] + rng.standard_normal(64).astype(np.float32) * 0.01
    rows = [{"vec_id": i, "embedding": vecs[i].tolist(), "label": 0}
            for i in range(100)]
    rows.append({"vec_id": 999, "embedding": dup.tolist(), "label": 0})
    out = tmp_path / "sf"
    out.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(out / "embeddings.parquet"))
    pairs = dedup_embedding_lsh(str(out), threshold=0.95).to_pandas()
    assert ((pairs["vec_a"] == 3) & (pairs["vec_b"] == 999)).any()


def test_events_by_segment_conservation(ray_session):
    import duckdb
    from linkinator_ray.pipelines.joins import events_by_segment
    df = events_by_segment(SF).to_pandas()
    total = duckdb.sql(f"SELECT count(*) n FROM '{SF}/events.parquet'").df()["n"][0]
    assert df["n_events"].sum() == total
    assert len(df) >= 2


def test_events_join_customer(ray_session):
    from linkinator_ray.pipelines.joins import events_join_customer
    df = events_join_customer(SF, limit_users=15).to_pandas()
    assert len(df) == 1000  # every sf0.001 event has user_id < 15
    assert df["c_mktsegment"].notna().all()


def test_pricing_summary_matches_duckdb(ray_session):
    import duckdb
    from linkinator_ray.pipelines.tpch import pricing_summary
    mine = pricing_summary(SF).to_pandas().sort_values(
        ["l_returnflag", "l_linestatus"]).reset_index(drop=True)
    theirs = duckdb.sql(f"""
        SELECT l_returnflag, l_linestatus,
               sum(CAST(floor(l_quantity*100) AS BIGINT)) sum_qty_centi,
               sum(CAST(floor(l_extendedprice*(1-l_discount)*100) AS BIGINT))
                   sum_disc_cents,
               count(*) count_order
        FROM '{SF}/lineitem.parquet'
        WHERE l_shipdate < TIMESTAMP '1998-09-02'
        GROUP BY 1,2 ORDER BY 1,2""").df()
    assert mine["sum_disc_cents"].tolist() == theirs["sum_disc_cents"].tolist()
    assert mine["count_order"].tolist() == theirs["count_order"].tolist()


def test_top_customers_order(ray_session):
    from linkinator_ray.pipelines.tpch import top_customers
    df = top_customers(SF, k=5).to_pandas()
    assert len(df) == 5
    totals = df["total_cents"].tolist()
    assert totals == sorted(totals, reverse=True)
    assert df["c_name"].notna().all()


def test_knn_ivf_recall_and_self_nearest(ray_session):
    """IVF with 4/16 probes: the query's own vector is always found
    (its list is probe #1), and recall vs brute force is substantial."""
    from linkinator_ray.pipelines.similarity import knn_bruteforce, knn_ivf
    exact = knn_bruteforce(SF, k=5, num_queries=4).to_pandas()
    approx = knn_ivf(SF, k=5, num_queries=4, n_centroids=16,
                     n_probe=4).to_pandas()
    top = approx[approx["rank"] == 1]
    assert (top["neighbor_id"].to_numpy() == top["query_id"].to_numpy()).all()
    exact_sets = exact.groupby("query_id")["neighbor_id"].apply(set)
    approx_sets = approx.groupby("query_id")["neighbor_id"].apply(set)
    recalls = [len(approx_sets.get(q, set()) & exact_sets[q]) / len(exact_sets[q])
               for q in exact_sets.index]
    assert np.mean(recalls) >= 0.4, recalls


def test_token_count_bpe_matches_re(ray_session):
    """The distributed count equals a local findall with the identical
    pattern (the DuckDB oracle runs the same RE2 pattern)."""
    import re

    import pyarrow.parquet as pq

    from linkinator_ray.pipelines.text import BPE_PRETOKEN_RE, token_count_bpe
    out = token_count_bpe(SF).to_pandas().sort_values("doc_id")
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas() \
        .sort_values("doc_id")
    pat = re.compile(BPE_PRETOKEN_RE)
    expected = [len(pat.findall(t or "")) for t in docs["text"]]
    assert out["n_bpe_tokens"].tolist() == expected
    assert (out["n_bpe_tokens"] > 0).all()


def test_corpus_dedup_keep_planted(ray_session, tmp_path):
    """End-to-end corpus dedup: planted exact duplicates drop with
    reason 'exact' (lowest doc_id kept), planted near-duplicates with
    reason 'near', and the written keep-side parquet is the complement."""
    import os

    import pyarrow as pa
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from linkinator_ray.pipelines.dedup import corpus_dedup_keep
    base = "the quick brown fox jumps over the lazy dog again and again " * 8
    rows = [
        {"doc_id": 0, "text": base},
        {"doc_id": 1, "text": base},                       # exact dup of 0
        {"doc_id": 2, "text": base + "tail minor edit"},   # near dup of 0
        {"doc_id": 3, "text": "completely different words entirely " * 20},
        {"doc_id": 4, "text": "another unrelated document body here " * 20},
    ]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    pq.write_table(pa.Table.from_pylist(rows), f"{sf}/documents.parquet")
    out = str(tmp_path / "kept")
    dropped = corpus_dedup_keep(sf, out_dir=out)
    by_id = dict(zip(dropped["doc_id"].to_pylist(),
                     dropped["reason"].to_pylist()))
    assert by_id.get(1) == "exact"
    assert by_id.get(2) == "near"
    kept = sorted(pads.dataset(out).to_table(
        columns=["doc_id"])["doc_id"].to_pylist())
    assert kept == [0, 3, 4]


def test_corpus_dedup_drops_stay_distributed(ray_session, tmp_path):
    """Scale contract of the keep path: the drop set is a Ray Dataset
    end-to-end (hash-partitioned left-anti join in workers), never a
    driver-side Python set — at 100 TB the drop set is billions of ids."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from linkinator_ray.pipelines.dedup import corpus_dedup_drops
    base = "the quick brown fox jumps over the lazy dog again and again " * 8
    rows = [
        {"doc_id": 0, "text": base},
        {"doc_id": 1, "text": base},                       # exact dup of 0
        {"doc_id": 2, "text": base + "tail minor edit"},   # near dup of 0
        {"doc_id": 3, "text": "an entirely different document about rayons"},
        {"doc_id": 4, "text": "yet another unrelated text with many words"},
    ]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    pq.write_table(pa.Table.from_pylist(rows), f"{sf}/documents.parquet")
    drops = corpus_dedup_drops(sf)
    assert isinstance(drops, ray.data.Dataset)
    got = {r["doc_id"]: r["reason"] for r in drops.take_all()}
    assert got == {1: "exact", 2: "near"}


def test_repetition_stats_planted(ray_session, tmp_path):
    """Gopher-style repetition fractions on docs with known repetition
    structure (integer-ppm arithmetic, exact)."""
    import pyarrow.parquet as pq
    from linkinator_ray.pipelines.text import repetition_stats
    rows = [
        {"doc_id": 0, "text": "batch batch batch stream"},
        {"doc_id": 1, "text": "a b c d"},
        {"doc_id": 2, "text": ""},
        {"doc_id": 3, "text": "x y x y x y z"},
    ]
    out = tmp_path / "sf"
    out.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(out / "documents.parquet"))
    got = {r["doc_id"]: r for r in
           repetition_stats(str(out)).to_pandas().to_dict("records")}
    assert got[0]["top_token_ppm"] == 750000      # 3/4 'batch'
    assert got[0]["dup_token_ppm"] == 750000
    assert got[0]["top_bigram_ppm"] == 666666     # 'batch batch' 2/3
    assert got[1]["dup_token_ppm"] == 0
    assert got[2]["n_tokens"] == 1                # '' splits to ['']
    assert got[2]["top_bigram_ppm"] == 0
    assert got[3]["top_bigram_ppm"] == 500000     # 'x y' 3/6


def test_pii_scrub_planted(ray_session, tmp_path):
    import pyarrow.parquet as pq
    from linkinator_ray.pipelines.text import pii_scrub
    rows = [
        {"doc_id": 0, "text": "mail bob.smith+x@corp.example.com or "
                              "10.0.0.1 call +1 (555) 123-4567 ok"},
        {"doc_id": 1, "text": "two mails a@b.co c@d.org no numbers"},
        {"doc_id": 2, "text": "clean document text"},
    ]
    out = tmp_path / "sf"
    out.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(out / "documents.parquet"))
    got = {r["doc_id"]: r for r in
           pii_scrub(str(out)).to_pandas().to_dict("records")}
    assert got[0]["n_email"] == 1 and got[0]["n_ipv4"] == 1 \
        and got[0]["n_phone"] == 1
    assert got[0]["clean_text"] == "mail <EMAIL> or <IP> call <PHONE> ok"
    assert got[1]["n_email"] == 2
    assert got[2]["clean_text"] == "clean document text"
    # redaction is idempotent: scrubbing scrubbed text changes nothing
    from linkinator_ray.pipelines.text import _pii_kernel
    clean = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([got[i]["clean_text"] for i in range(3)])})
    again = _pii_kernel(clean).to_pylist()
    assert all(r["n_email"] == 0 and r["n_ipv4"] == 0 and r["n_phone"] == 0
               for r in again)


def test_rolling_mulmod_field_arithmetic():
    """numpy Mersenne-prime (2^61-1) mulmod matches arbitrary-precision
    integers on random operands (the vectorized rolling-hash core)."""
    import numpy as np
    from linkinator_ray.pipelines.text import _mulmod_p, ROLLING_P
    rng = np.random.default_rng(11)
    a = rng.integers(0, ROLLING_P, 50000, dtype=np.uint64)
    b = rng.integers(0, ROLLING_P, 50000, dtype=np.uint64)
    got = _mulmod_p(a, b).astype(object)
    exp = (a.astype(object) * b.astype(object)) % ROLLING_P
    assert (got == exp).all()
    edge = np.array([0, 1, ROLLING_P - 1, (1 << 32) - 1, 1 << 32],
                    dtype=np.uint64)
    for x in edge:
        got_e = _mulmod_p(edge, x).astype(object)
        exp_e = (edge.astype(object) * int(x)) % ROLLING_P
        assert (got_e == exp_e).all()


def test_events_asof_order_semantics(ray_session, tmp_path):
    """As-of join picks the latest order at-or-before each event,
    drops events with no prior order, and breaks orderdate ties by max
    o_orderkey (the documented deterministic tie-break)."""
    import pyarrow.parquet as pq
    from linkinator_ray.pipelines.joins import events_asof_order
    us = 1_000_000
    ev = pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "ts": pa.array([10 * us, 25 * us, 5 * us, 30 * us],
                       pa.timestamp("us")),
        "user_id": pa.array([7, 7, 7, 8], pa.int64()),
    })
    od = pa.table({
        "o_orderkey": pa.array([100, 101, 102, 103, 200], pa.int64()),
        "o_custkey": pa.array([7, 7, 7, 7, 9], pa.int64()),
        "o_orderdate": pa.array([8 * us, 20 * us, 20 * us, 26 * us, 1 * us],
                                pa.timestamp("us")),
        "o_totalprice": pa.array([1.0, 2.0, 3.0, 4.0, 5.0]),
    })
    out = tmp_path / "sf"
    out.mkdir()
    pq.write_table(ev, str(out / "events.parquet"))
    pq.write_table(od, str(out / "orders.parquet"))
    got = {r["event_id"]: r for r in
           events_asof_order(str(out)).to_pandas().to_dict("records")}
    assert set(got) == {1, 2}           # event 3 predates all orders,
    assert got[1]["o_orderkey"] == 100  # event 4's user has no orders
    # ts=25: two orders at date 20 → max orderkey (102) wins, and its
    # own totalprice rides along
    assert got[2]["o_orderkey"] == 102
    assert got[2]["total_cents"] == 300


def test_dedup_chunk_planted(ray_session, tmp_path):
    """Plant a doc that repeats another doc's first 16-token chunk:
    the later occurrence is dropped and the doc rebuilds without it."""
    import pyarrow.parquet as pq
    from linkinator_ray.pipelines.dedup import dedup_chunk
    chunk_a = " ".join(f"a{i}" for i in range(16))
    chunk_b = " ".join(f"b{i}" for i in range(16))
    chunk_c = " ".join(f"c{i}" for i in range(16))
    rows = [
        {"doc_id": 1, "text": chunk_a + " " + chunk_b},
        # repeats chunk_a (dropped), keeps its own chunk_c
        {"doc_id": 2, "text": chunk_a + " " + chunk_c},
        # exact duplicate of doc 1 → both chunks dropped, empty rebuild
        {"doc_id": 3, "text": chunk_a + " " + chunk_b},
    ]
    out = tmp_path / "sf"
    out.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(out / "documents.parquet"))
    df = dedup_chunk(str(out)).to_pandas().set_index("doc_id")
    assert df.loc[1, "n_dropped"] == 0
    assert df.loc[1, "clean_text"] == chunk_a + " " + chunk_b
    assert df.loc[2, "n_dropped"] == 1
    assert df.loc[2, "clean_text"] == chunk_c
    assert df.loc[3, "n_dropped"] == 2
    assert df.loc[3, "clean_text"] == ""
    assert (df["n_chunks"] == 2).all()


def _substring_reference(rows, w):
    """Pure-Python (bigint) reference for dedup_substring: rolling
    window hashes, global first-occurrence winners, position coverage."""
    import hashlib
    import re
    P, B = (1 << 61) - 1, 1000003
    toks = {r["doc_id"]: (re.split(r"\s+", r["text"].strip())
                          if r["text"].strip() else []) for r in rows}
    th = {d: [int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big") % P
              for t in ts] for d, ts in toks.items()}
    occ = {}  # wh -> sorted list of (doc_id, pos)
    for d in sorted(th):
        h = th[d]
        for i in range(len(h) - w + 1):
            wh = 0
            for j in range(w):
                wh = (wh + h[i + j] * pow(B, w - 1 - j, P)) % P
            occ.setdefault(wh, []).append((d, i))
    out = {}
    cov = {d: set() for d in toks}
    for wh, lst in occ.items():
        for d, i in sorted(lst)[1:]:
            cov[d].update(range(i, i + w))
    for d, ts in toks.items():
        kept = [t for i, t in enumerate(ts) if i not in cov[d]]
        out[d] = {"n_tokens": len(ts), "n_removed": len(cov[d]),
                  "clean_text": " ".join(kept)}
    return out


def test_dedup_substring_planted(ray_session, tmp_path):
    """Unaligned sliding-window substring dedup: a copied 20-token span
    at a DIFFERENT offset (which chunk-aligned dedup misses) is fully
    removed from the later doc; within-doc repeats and exact-duplicate
    docs dedup too; short and empty docs pass through. The whole corpus
    is also checked against a pure-Python bigint reference."""
    import pyarrow.parquet as pq
    from linkinator_ray.pipelines.dedup import dedup_substring
    x = " ".join(f"x{i}" for i in range(20))
    y = " ".join(f"y{i}" for i in range(16))
    dup20 = " ".join(f"d{i}" for i in range(20))
    rows = [
        {"doc_id": 0, "text": " ".join(f"a{i}" for i in range(30))},
        # first occurrence of the x-span (offset 5) — kept intact
        {"doc_id": 1, "text": " ".join(f"b{i}" for i in range(5)) + " " + x
                              + " " + " ".join(f"b{i}" for i in range(5, 10))},
        # same 20-token span at offset 3: chunk alignment differs, the
        # sliding windows still hit — all 20 x-tokens removed
        {"doc_id": 2, "text": "c0 c1 c2 " + x + " "
                              + " ".join(f"c{i}" for i in range(3, 8))},
        # within-doc repeat: second y-window is covered
        {"doc_id": 3, "text": y + " z " + y},
        {"doc_id": 4, "text": "short doc of five tokens"},
        {"doc_id": 5, "text": ""},
        {"doc_id": 6, "text": dup20},
        {"doc_id": 7, "text": dup20},  # exact duplicate → fully removed
    ]
    out = tmp_path / "sf"
    out.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(out / "documents.parquet"))
    df = dedup_substring(str(out), window=16).to_pandas() \
        .set_index("doc_id").sort_index()
    assert df.loc[1, "n_removed"] == 0
    assert df.loc[2, "n_removed"] == 20
    assert df.loc[2, "clean_text"] == "c0 c1 c2 c3 c4 c5 c6 c7"
    assert df.loc[3, "n_removed"] == 16
    assert df.loc[3, "clean_text"] == y + " z"
    assert df.loc[4, "n_removed"] == 0
    # empty doc: ZERO tokens (not Arrow's phantom '' split token)
    assert df.loc[5, "n_tokens"] == 0 and df.loc[5, "n_removed"] == 0
    assert df.loc[5, "clean_text"] == ""
    assert df.loc[6, "n_removed"] == 0
    assert df.loc[7, "n_removed"] == 20 and df.loc[7, "clean_text"] == ""
    ref = _substring_reference(rows, 16)
    for d, exp in ref.items():
        for k, v in exp.items():
            assert df.loc[d, k] == v, (d, k, df.loc[d, k], v)
    with pytest.raises(ValueError):
        dedup_substring(str(out), window=0)


def test_dedup_substring_empty_docs_window1(ray_session, tmp_path):
    """At window=1 empty/whitespace-only docs must NOT dedup against
    each other through Arrow's phantom '' split token: each reports
    n_tokens=0 / n_removed=0, and real single-token dedup still works."""
    import pyarrow.parquet as pq
    from linkinator_ray.pipelines.dedup import dedup_substring
    rows = [
        {"doc_id": 0, "text": ""},
        {"doc_id": 1, "text": "   "},       # whitespace-only
        {"doc_id": 2, "text": "\t\n"},
        {"doc_id": 3, "text": "tok"},
        {"doc_id": 4, "text": "tok"},        # real dup at w=1
    ]
    out = tmp_path / "sf"
    out.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(out / "documents.parquet"))
    df = dedup_substring(str(out), window=1).to_pandas() \
        .set_index("doc_id").sort_index()
    assert len(df) == 5  # one row per doc, empties included
    for d in (0, 1, 2):
        assert df.loc[d, "n_tokens"] == 0
        assert df.loc[d, "n_removed"] == 0
        assert df.loc[d, "clean_text"] == ""
    assert df.loc[3, "n_removed"] == 0 and df.loc[3, "clean_text"] == "tok"
    assert df.loc[4, "n_removed"] == 1 and df.loc[4, "clean_text"] == ""


def test_explode_kernels_multichunk_batch():
    """The explode kernels must not combine a multi-chunk text column
    (>2 GiB of strings overflows int32 offsets at real batch sizes):
    a batch assembled from several record batches must produce exactly
    the same rows as the same data in one contiguous chunk."""
    from linkinator_ray.pipelines.dedup import (_explode_chunks,
                                                _explode_windows)
    rb1 = pa.record_batch({"doc_id": pa.array([0, 1], pa.int64()),
                           "text": ["a b c d e", ""]})
    rb2 = pa.record_batch({"doc_id": pa.array([2], pa.int64()),
                           "text": ["a b c d e f"]})
    multi = pa.Table.from_batches([rb1, rb2])
    single = multi.combine_chunks()
    assert len(multi.column("text").chunks) == 2
    for w in (1, 3):
        assert _explode_windows(multi, w).to_pydict() \
            == _explode_windows(single, w).to_pydict()
    for W in (2, 4):
        assert _explode_chunks(multi, W, "hash").to_pydict() \
            == _explode_chunks(single, W, "hash").to_pydict()


def test_contamination_check_planted(ray_session, tmp_path):
    """A doc embedding a benchmark doc's text verbatim scores ~100%
    contamination; a doc of novel tokens scores 0."""
    import pyarrow.parquet as pq
    from linkinator_ray.pipelines.dedup import contamination_check
    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        {"doc_id": 0, "text": bench_text},                     # benchmark (0 % 50 == 0)
        {"doc_id": 1, "text": bench_text},                     # fully contaminated
        {"doc_id": 2, "text": "nova luna kilo mike zulu xray"},  # clean
        {"doc_id": 3, "text": "alpha beta gamma nova luna kilo"},  # partial
    ]
    out = tmp_path / "sf"
    out.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(out / "documents.parquet"))
    df = contamination_check(str(out)).to_pandas().set_index("doc_id")
    assert 0 not in df.index  # benchmark docs are not scored
    assert df.loc[1, "contam_ppm"] == 1_000_000
    assert df.loc[2, "n_contaminated"] == 0
    # 'alpha beta gamma' is the only benchmark trigram of doc 3's four
    assert df.loc[3, "n_contaminated"] == 1
    assert df.loc[3, "n_ngrams"] == 4


def test_sample_by_source_deterministic(ray_session):
    """The md5 coin is deterministic: two runs agree row-for-row, the
    keep rule is exactly u_ppm < p_ppm, and p_ppm follows the source
    number."""
    import hashlib
    from linkinator_ray.pipelines.text import sample_by_source
    a = sample_by_source(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = sample_by_source(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert (a["u_ppm"] < a["p_ppm"]).all()
    for _, row in a.head(20).iterrows():
        u = int(hashlib.md5(str(row["doc_id"]).encode()).hexdigest()[:8],
                16) % 1_000_000
        n = int(row["source"].lstrip("src"))
        assert row["u_ppm"] == u
        assert row["p_ppm"] == (n % 20 + 1) * 50_000


def test_sample_by_source_digitless_source(ray_session, tmp_path):
    """A source with no digit run (or null) maps to source_number 0 →
    p_ppm 50_000, matching the oracle's COALESCE(TRY_CAST(...), 0) —
    previously the null extraction round-tripped through float64 NaN
    into INT64_MIN and produced a silent 650_000."""
    import pyarrow.parquet as pq
    from linkinator_ray.pipelines.text import sample_by_source
    # doc_ids whose md5 coin is < 50_000 — kept in EVERY bucket, so the
    # emitted p_ppm for each source shape is observable
    ids = [6, 8, 13, 19, 38]
    srcs = ["web", None, "src7", "crawl-data", "s123456789012345678x"]
    rows = [{"doc_id": i, "source": s, "text": "x", "lang": "en"}
            for i, s in zip(ids, srcs)]
    out = tmp_path / "sf"
    out.mkdir()
    pq.write_table(pa.Table.from_pylist(rows),
                   str(out / "documents.parquet"))
    df = sample_by_source(str(out)).to_pandas().set_index("doc_id")
    assert set(df.index) == set(ids)  # coin < 50k keeps all five
    for i in (6, 8, 19):  # digit-less and null sources → 5% bucket
        assert df.loc[i, "p_ppm"] == 50_000
    assert df.loc[13, "p_ppm"] == 400_000  # src7 → (7 % 20 + 1) * 50k
    # 19-digit run reads its first 18 digits (int64-safe on both sides)
    assert df.loc[38, "p_ppm"] == \
        (123456789012345678 % 20 + 1) * 50_000


def test_kmeans_matches_local_lloyd(ray_session):
    """The distributed broadcast/partial-reduce k-means must reproduce
    a single-machine Lloyd run with the same deterministic init."""
    import duckdb
    from linkinator_ray.pipelines.similarity import kmeans_embeddings
    k, iters = 5, 4
    got = kmeans_embeddings(SF, k=k, iters=iters).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    tab = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet' ORDER BY vec_id"
    ).arrow()
    emb = np.array(tab["embedding"].to_pylist(), dtype=np.float64)
    emb /= np.clip(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12, None)
    cents = emb[:k].copy()
    for _ in range(iters):
        assign = (emb @ cents.T).argmax(1)
        new = cents.copy()
        for c in range(k):
            s = emb[assign == c].sum(0)
            if (assign == c).any() and np.linalg.norm(s) > 1e-12:
                new[c] = s / np.linalg.norm(s)
        cents = new
    ref = (emb @ cents.T).argmax(1)
    agree = (got["cluster"].to_numpy() == ref).mean()
    assert agree > 0.995, agree
    assert got["cluster"].nunique() > 1


def test_pack_sequences_scan_invariants(ray_session):
    """The distributed prefix scan is a true exclusive scan: in doc_id
    order, each doc's (bin_id, bin_offset) equals the running token
    total of all earlier docs, regardless of how the hash partitions
    grouped the ranges."""
    from linkinator_ray.pipelines.text import pack_sequences
    df = pack_sequences(SF, context_tokens=128).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(df) == 500
    prev = np.concatenate(([0], np.cumsum(df["n_tokens"].to_numpy())[:-1]))
    assert (df["bin_id"].to_numpy() == prev // 128).all()
    assert (df["bin_offset"].to_numpy() == prev % 128).all()
    # small partition counts force several doc_id ranges into one hash
    # partition — the per-range bases must still be exact
    df3 = pack_sequences(SF, context_tokens=128, num_parts=3).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(df, df3)


def test_shuffle_export_permutation(ray_session):
    """The export shuffle is a permutation: every doc appears once,
    (shard, pos) pairs are unique and dense per shard, the assignment
    is deterministic across runs, and it actually breaks doc_id order."""
    from linkinator_ray.pipelines.text import shuffle_export
    a = shuffle_export(SF, num_shards=8).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = shuffle_export(SF, num_shards=8).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 500 and a["doc_id"].is_unique
    for shard, g in a.groupby("shard"):
        assert sorted(g["pos"]) == list(range(len(g)))
    # within a shard, pos order must not be doc_id order (it's md5 order)
    g0 = a[a["shard"] == a["shard"].iloc[0]].sort_values("pos")
    assert not g0["doc_id"].is_monotonic_increasing


def test_length_quantiles_exact(ray_session):
    """Histogram quantiles equal a single-machine exact computation
    under the ceil(q·n) definition."""
    import pyarrow.parquet as pq
    from linkinator_ray.pipelines.text import length_quantiles
    got = length_quantiles(SF).to_pandas() \
        .sort_values(["lang", "q_ppm"]).reset_index(drop=True)
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["lang", "text"]).to_pandas()
    docs["val"] = docs["text"].str.strip().str.split().str.len()
    rows = []
    for lang, g in docs.groupby("lang"):
        vals = np.sort(g["val"].to_numpy())
        n = len(vals)
        for q in (500_000, 900_000, 990_000):
            thr = (q * n + 999_999) // 1_000_000
            rows.append({"lang": lang, "q_ppm": q,
                         "n_tokens_q": int(vals[max(thr - 1, 0)])})
    exp = pd.DataFrame(rows).sort_values(["lang", "q_ppm"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"q_ppm": "int64", "n_tokens_q": "int64"}), exp)


def test_train_split_deterministic_and_salted(ray_session):
    """Every doc gets exactly one split, assignment is deterministic,
    fractions land near 90/5/5, and a different salt draws an
    independent assignment (docs don't move as a block)."""
    from linkinator_ray.pipelines.text import train_split
    a = train_split(SF).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    b = train_split(SF).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 500 and a["doc_id"].is_unique
    frac = a["split"].value_counts(normalize=True)
    assert 0.85 <= frac.get("train", 0) <= 0.95
    assert frac.get("val", 0) <= 0.10 and frac.get("test", 0) <= 0.10
    c = train_split(SF, salt="other").to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert (a["split"] != c["split"]).any()
    # incremental-growth safety: restricting the corpus never moves a doc
    half = a[a["doc_id"] < a["doc_id"].median()]
    merged = half.merge(a, on="doc_id", suffixes=("_h", ""))
    assert (merged["split_h"] == merged["split"]).all()


def test_shipping_priority_matches_duckdb(ray_session):
    """Q3 shape end-to-end vs DuckDB: same top-k set, same order."""
    import duckdb
    from linkinator_ray.pipelines.tpch import shipping_priority
    got = shipping_priority(SF).to_pandas()
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    want = con.sql("""
        SELECT l.l_orderkey AS l_orderkey,
               CAST(sum(CAST(floor(l.l_extendedprice*100 + 0.5) AS BIGINT) *
                        (100 - CAST(floor(l.l_discount*100 + 0.5) AS BIGINT)))
                    AS BIGINT) AS revenue_u,
               o.o_orderdate AS o_orderdate,
               o.o_orderpriority AS o_orderpriority
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-06-01'
          AND l.l_shipdate > TIMESTAMP '1998-06-01'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue_u DESC, l_orderkey LIMIT 10
    """).df()
    assert got["l_orderkey"].tolist() == want["l_orderkey"].tolist()
    assert got["revenue_u"].tolist() == want["revenue_u"].tolist()


def test_tfidf_top_terms_semantics(ray_session, tmp_path):
    """Planted corpus: a term unique to one doc must outrank terms that
    appear everywhere; exactly k rows per doc with dense ranks."""
    import pyarrow.parquet as pq
    from linkinator_ray.pipelines.text import tfidf_top_terms
    common = "alpha beta gamma"
    rows = [
        {"doc_id": 0, "text": common + " unicorn unicorn"},
        {"doc_id": 1, "text": common + " dragon"},
        {"doc_id": 2, "text": common},
    ]
    out = tmp_path / "sf"
    out.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(out / "documents.parquet"))
    df = tfidf_top_terms(str(out), k=2).to_pandas()
    assert (df.groupby("doc_id")["rank"].max() <= 2).all()
    top0 = df[(df["doc_id"] == 0) & (df["rank"] == 1)].iloc[0]
    assert top0["token"] == "unicorn" and top0["tf"] == 2 and top0["df"] == 1
    top1 = df[(df["doc_id"] == 1) & (df["rank"] == 1)].iloc[0]
    assert top1["token"] == "dragon"
    # doc 2 has only corpus-wide terms: rank 1 is the alphabetically
    # first of the equally-scored common terms
    top2 = df[(df["doc_id"] == 2) & (df["rank"] == 1)].iloc[0]
    assert top2["token"] == "alpha" and top2["df"] == 3


def test_unigram_logppl_semantics_and_fallback(ray_session, tmp_path):
    """A doc of corpus-common tokens must score a LOWER average NLL
    than a doc of singleton tokens (the quality-filter contract), and
    the threshold=0 hash-join scale path must equal the broadcast
    path bit-for-bit."""
    import pyarrow.parquet as pq

    from linkinator_ray.pipelines.text import unigram_logppl
    common = "the quick brown fox " * 10
    rows = [{"doc_id": i, "text": common.strip()} for i in range(8)]
    rows.append({"doc_id": 8, "text": "zxqj vvkw pplm qqrs ttuv"})
    out = tmp_path / "sf"
    out.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(out / "documents.parquet"))

    def canon(res):
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        return df.sort_values("doc_id").reset_index(drop=True)

    fast = canon(unigram_logppl(str(out)))
    assert fast.loc[0, "avg_nll_q16"] < fast.loc[8, "avg_nll_q16"]
    assert fast.loc[8, "n_tokens"] == 5
    slow = canon(unigram_logppl(str(out), broadcast_vocab_threshold=0))
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False)


def test_text_normalize_unicode_edges(ray_session, tmp_path):
    """NFC folds combining sequences into precomposed forms, lowercase
    is Unicode-aware (utf8proc), and whitespace runs collapse — so
    trivially-variant copies normalize to the SAME string (the
    pre-dedup contract)."""
    import pyarrow.parquet as pq

    from linkinator_ray.pipelines.text import text_normalize
    rows = [
        {"doc_id": 1, "text": "Cafe\u0301  Society"},  # e + combining acute
        {"doc_id": 2, "text": "caf\u00e9 society"},     # precomposed e-acute
        {"doc_id": 3, "text": " \tA\u030aB \n"},       # A + combining ring
        {"doc_id": 4, "text": ""},
    ]
    out = tmp_path / "sf"
    out.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(out / "documents.parquet"))
    df = text_normalize(str(out)).to_pandas().set_index("doc_id")
    assert df.loc[1, "text_norm"] == df.loc[2, "text_norm"] == "caf\u00e9 society"
    assert df.loc[3, "text_norm"] == "\u00e5b"
    assert df.loc[4, "text_norm"] == "" and df.loc[4, "n_chars_norm"] == 0
    assert df.loc[1, "n_chars_norm"] == len("caf\u00e9 society")


def test_chunk_documents_boundaries(ray_session, tmp_path):
    """Chunk windows pinned: overlap carries the window tail forward,
    the final chunk clips to the doc end, an exact-fit doc emits one
    chunk (no redundant tail window), and every doc — even empty —
    yields at least one chunk."""
    import pyarrow.parquet as pq

    from linkinator_ray.pipelines.text import chunk_documents
    rows = [
        {"doc_id": 1, "text": " ".join(f"t{i}" for i in range(10))},
        {"doc_id": 2, "text": "a b c d"},   # exact fit: one chunk
        {"doc_id": 3, "text": "a b"},       # shorter than a chunk
        {"doc_id": 4, "text": ""},          # empty → one ['']-token chunk
    ]
    out = tmp_path / "sf"
    out.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(out / "documents.parquet"))
    df = chunk_documents(str(out), chunk_tokens=4, overlap=1).to_pandas() \
        .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    got = {(r.doc_id, r.chunk_id): (r.chunk_text, r.n_tokens)
           for r in df.itertuples()}
    assert got[(1, 0)] == ("t0 t1 t2 t3", 4)
    assert got[(1, 1)] == ("t3 t4 t5 t6", 4)      # overlap=1 carries t3
    assert got[(1, 2)] == ("t6 t7 t8 t9", 4)
    assert len([k for k in got if k[0] == 1]) == 3
    assert got[(2, 0)] == ("a b c d", 4)
    assert len([k for k in got if k[0] == 2]) == 1  # exact fit, no tail
    assert got[(3, 0)] == ("a b", 2)
    assert got[(4, 0)] == ("", 1)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        chunk_documents(str(out), chunk_tokens=4, overlap=4)


def test_tfidf_fallback_path_identical(ray_session, tmp_path):
    """broadcast_df_threshold=0 forces the hash_join + partitioned
    top-k scale path; output must equal the broadcast map-side path
    (the auto-hybrid contract, same pattern as components/minhash)."""
    from linkinator_ray.pipelines.text import tfidf_top_terms

    def canon(res):
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        return df.sort_values(["doc_id", "rank"]).reset_index(drop=True)

    sf = "/root/testdata/sf0.001"
    fast = canon(tfidf_top_terms(sf, k=3))
    slow = canon(tfidf_top_terms(sf, k=3, broadcast_df_threshold=0))
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False)


def test_lang_id_vectorized_matches_scalar(ray_session):
    """The vectorized LangId kernel is bit-identical to the per-doc
    scalar reference on real testdata plus adversarial edges (token
    cap, CJK head, empties, nulls)."""
    from linkinator_ray.pipelines.text import LangId

    import pyarrow.parquet as pq
    li = LangId()
    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])
    edge = pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array(["", "   ", "的" * 500,
                          "x " * 300 + "the " * 50,  # past the 200 cap
                          None, "el la de the and der die"], pa.string())})
    for tbl in (docs, edge):
        out = li(tbl)
        for i, t in enumerate(tbl["text"].to_pylist()):
            want = li.score_scalar(t or "")
            got = (out["predicted_lang"][i].as_py(),
                   out["confidence_ppm"][i].as_py())
            assert got == want, (i, (t or "")[:50], want, got)


def test_stratified_sample_exact_quota(ray_session):
    """Exact per-lang quota: counts are min(N, lang size), the chosen
    docs are exactly the N smallest md5 coins per lang (single-machine
    differential), ranks are dense 1..N, and the sample is
    deterministic across runs."""
    import hashlib

    import pyarrow.parquet as pq
    from linkinator_ray.pipelines.text import stratified_sample

    sf = "/root/testdata/sf0.001"
    got = stratified_sample(sf, n_per_lang=30).to_pandas() \
        .sort_values(["lang", "rank"]).reset_index(drop=True)
    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["doc_id", "lang"]).to_pandas()
    docs["coin"] = [
        int.from_bytes(hashlib.md5(str(i).encode()).digest()[:8], "big")
        for i in docs["doc_id"]]
    expect = docs.sort_values(["lang", "coin", "doc_id"]) \
        .groupby("lang").head(30)
    for lang, g in expect.groupby("lang"):
        mine = got[got["lang"] == lang]
        assert len(mine) == min(30, (docs["lang"] == lang).sum())
        assert list(mine.sort_values("rank")["doc_id"]) == list(g["doc_id"])
        assert list(mine["rank"].sort_values()) == list(range(1, len(mine) + 1))
    again = stratified_sample(sf, n_per_lang=30).to_pandas() \
        .sort_values(["lang", "rank"]).reset_index(drop=True)
    assert got.equals(again)


def test_funnel_planted_semantics(ray_session, tmp_path):
    """Order matters: a user whose purchase PRECEDES the click must not
    count as stage 3; the greedy chain anchors at the EARLIEST
    qualifying event of each stage."""
    import pyarrow.parquet as pq

    from linkinator_ray.pipelines.events import funnel

    def ev(eid, ts_s, uid, typ):
        return {"event_id": eid, "ts": np.datetime64(ts_s, "us"),
                "user_id": uid, "event_type": typ, "value": 1.0,
                "props": ""}

    rows = [
        # u1: view -> click -> purchase (completes all 3)
        ev(1, "2024-01-01T00:00:00", 1, "view"),
        ev(2, "2024-01-01T00:01:00", 1, "click"),
        ev(3, "2024-01-01T00:02:00", 1, "purchase"),
        # u2: purchase BEFORE click: stops at stage 2
        ev(4, "2024-01-01T00:00:00", 2, "view"),
        ev(5, "2024-01-01T00:02:00", 2, "click"),
        ev(6, "2024-01-01T00:01:00", 2, "purchase"),
        # u3: click only: no view anchor, counts nowhere
        ev(7, "2024-01-01T00:00:00", 3, "click"),
        # u4: view only
        ev(8, "2024-01-01T00:00:00", 4, "view"),
        # u5: simultaneous view+click (strict > drops the click)
        ev(9, "2024-01-01T00:00:00", 5, "view"),
        ev(10, "2024-01-01T00:00:00", 5, "click"),
    ]
    out = tmp_path / "sf"
    out.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(out / "events.parquet"))
    df = funnel(str(out)).to_pandas().set_index("stage").sort_index()
    assert list(df["n_users"]) == [4, 2, 1]
    assert list(df["stage_name"]) == ["view", "click", "purchase"]


def test_keyword_search_planted(ray_session, tmp_path):
    """AND semantics: a doc with only one query term never matches; the
    ranking is total term frequency with doc_id tiebreak."""
    import pyarrow.parquet as pq

    from linkinator_ray.pipelines.text import keyword_search
    rows = [
        {"doc_id": 1, "text": "apple banana apple banana apple"},  # 3+2=5
        {"doc_id": 2, "text": "apple banana"},                      # 1+1=2
        {"doc_id": 3, "text": "apple apple apple apple"},           # missing banana
        {"doc_id": 4, "text": "cherry"},
        {"doc_id": 5, "text": "banana apple"},                      # 2, ties doc 2
    ]
    out = tmp_path / "sf"
    out.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(out / "documents.parquet"))
    df = keyword_search(str(out), terms=("apple", "banana"), k=10).to_pandas()
    assert list(df["doc_id"]) == [1, 2, 5]
    assert list(df["score"]) == [5, 2, 2]


def test_bm25_search_planted(ray_session, tmp_path):
    """BM25 semantics pinned: OR matching (a one-term doc still ranks),
    idf (a rare-term doc outranks a common-term doc at equal tf and
    length), and length normalization (same tf, shorter doc wins)."""
    import pyarrow.parquet as pq

    from linkinator_ray.pipelines.text import bm25_search
    filler = " ".join(f"x{i}" for i in range(20))
    rows = [
        # 'rare' appears in 1 doc; 'common' in 4 — idf(rare) >> idf(common)
        {"doc_id": 1, "text": "rare " + filler},
        {"doc_id": 2, "text": "common " + filler},
        {"doc_id": 3, "text": "common common aa bb cc"},   # short, tf=2
        {"doc_id": 4, "text": "common common " + filler},  # long, tf=2
        {"doc_id": 5, "text": "common zz"},
        {"doc_id": 6, "text": "nothing here"},
    ]
    out = tmp_path / "sf"
    out.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(out / "documents.parquet"))
    df = bm25_search(str(out), terms=("rare", "common"), k=10).to_pandas()
    got = list(df["doc_id"])
    assert 6 not in got and len(got) == 5          # OR semantics
    assert got[0] == 1                             # idf dominates
    assert got.index(3) < got.index(4)             # length normalization
    assert (df["score"] > 0).all()


def test_bm25_search_integer_reference(ray_session):
    """Bit-exact differential: the distributed two-pass BM25 equals a
    single-machine pure-Python integer reference (same Q10/Q16 fixed
    point) on real testdata — and is deterministic across runs."""
    import re

    import pyarrow.parquet as pq

    from linkinator_ray.pipelines.text import BM25_LOG2, bm25_search
    sf = "/root/testdata/sf0.001"
    terms, k = ("hash", "dup", "window"), 10
    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["doc_id", "text"]).to_pylist()
    # re.split(r"\s+", "") == [""] — matches Arrow split_pattern_regex
    toks = {d["doc_id"]: re.split(r"\s+", (d["text"] or "").strip())
            for d in docs}
    n = len(toks)
    total = sum(len(v) for v in toks.values())
    avgdl_fp = (total * 1024) // n

    def log2_fp(x: int) -> int:
        e = x.bit_length() - 1
        return e * 65536 + BM25_LOG2[((x << 8) >> e) & 255]

    uniq = sorted(set(terms))
    df_of = {t: sum(t in set(v) for v in toks.values()) for t in uniq}
    idf = {t: log2_fp(((2 * n - 2 * df_of[t] + 1) * 65536)
                      // (2 * df_of[t] + 1) + 65536) - 16 * 65536
           for t in uniq}
    scores = {}
    for doc_id, tl in toks.items():
        dl_fp = len(tl) * 1024
        s = 0
        for t in uniq:
            tf = tl.count(t)
            if tf:
                tfnorm = (44 * tf * avgdl_fp * 1024) // (
                    20 * tf * avgdl_fp + 6 * avgdl_fp + 18 * dl_fp)
                s += idf[t] * tfnorm
        if s:
            scores[doc_id] = s
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    got1 = bm25_search(sf, terms=terms, k=k).to_pandas()
    got2 = bm25_search(sf, terms=terms, k=k).to_pandas()
    assert list(map(tuple, got1[["doc_id", "score"]].to_records(
        index=False))) == want
    assert got1.equals(got2)


def test_hll_distinct_tokens_accuracy(ray_session):
    """The sketch estimate must land within the HLL error envelope
    (~1.04/sqrt(256) = 6.5%; assert 10%) of the exact per-lang
    distinct-token count, and be deterministic."""
    import duckdb

    from linkinator_ray.pipelines.text import hll_distinct_tokens

    sf = "/root/testdata/sf0.001"
    got = hll_distinct_tokens(sf).to_pandas().set_index("lang")
    exact = dict(duckdb.sql(f"""
        SELECT lang, count(DISTINCT tok) FROM (
          SELECT lang, unnest(string_split_regex(trim(text), '\\s+')) AS tok
          FROM read_parquet('{sf}/documents.parquet')) GROUP BY lang
    """).fetchall())
    assert set(got.index) == set(exact)
    for lang, true_n in exact.items():
        est = int(got.loc[lang, "distinct_est"])
        assert abs(est - true_n) / true_n < 0.10, (lang, est, true_n)
    again = hll_distinct_tokens(sf).to_pandas().set_index("lang")
    assert got.sort_index().equals(again.sort_index())


def test_cms_token_counts_one_sided(ray_session):
    """Count-min guarantees: estimate >= truth always (collisions only
    add), an absent token stays near zero, and frequent tokens come
    back within the epsilon envelope on this vocab."""
    import duckdb

    from linkinator_ray.pipelines.text import cms_token_counts

    sf = "/root/testdata/sf0.001"
    got = cms_token_counts(sf, query_tokens=(
        "hash", "join", "scan", "zzz_absent")).to_pandas() \
        .set_index("token")["est_count"]
    truth = dict(duckdb.sql(f"""
        SELECT tok, count(*) FROM (
          SELECT unnest(string_split_regex(trim(text), '\\s+')) AS tok
          FROM read_parquet('{sf}/documents.parquet'))
        WHERE tok IN ('hash','join','scan') GROUP BY tok
    """).fetchall())
    total = duckdb.sql(f"""
        SELECT count(*) FROM (SELECT unnest(
          string_split_regex(trim(text), '\\s+')) FROM
          read_parquet('{sf}/documents.parquet'))""").fetchone()[0]
    for tok, true_n in truth.items():
        est = int(got.loc[tok])
        assert est >= true_n, (tok, est, true_n)
        # CM bound: overshoot <= e/w * total with high probability
        assert est - true_n <= 3 * total / 1024, (tok, est, true_n)
    assert int(got.loc["zzz_absent"]) <= 3 * total / 1024


def test_interval_join_planted_semantics(ray_session, tmp_path):
    """Window bounds: strictly-after lower bound (equal ts excluded),
    inclusive upper bound (gap == window matches, window+1us doesn't),
    all pairs (two clicks before one purchase -> two rows), user
    co-location (cross-user pairs never match), other event types
    invisible."""
    import pyarrow.parquet as pq

    from linkinator_ray.pipelines.events import interval_join

    def ev(eid, ts_s, uid, typ):
        return {"event_id": eid, "ts": np.datetime64(ts_s, "us"),
                "user_id": uid, "event_type": typ, "value": 1.0,
                "props": ""}

    rows = [
        # u1: purchase exactly window (1800s) after the click: IN;
        # purchase at the same ts as the click: OUT (strict >);
        # purchase before the click: OUT
        ev(1, "2024-01-01T00:00:00", 1, "click"),
        ev(2, "2024-01-01T00:30:00", 1, "purchase"),          # gap = 1800s
        ev(3, "2024-01-01T00:00:00", 1, "purchase"),          # equal ts
        ev(4, "2023-12-31T23:59:00", 1, "purchase"),          # before
        # u2: two clicks inside the window of one purchase -> 2 pairs;
        # a view between them is invisible
        ev(5, "2024-01-01T00:00:00", 2, "click"),
        ev(6, "2024-01-01T00:10:00", 2, "click"),
        ev(7, "2024-01-01T00:05:00", 2, "view"),
        ev(8, "2024-01-01T00:20:00", 2, "purchase"),
        # u3: purchase 1800s + 1us after u3's click: OUT (upper bound)
        ev(9, "2024-01-01T00:00:00", 3, "click"),
        {"event_id": 10,
         "ts": np.datetime64("2024-01-01T00:30:00", "us")
         + np.timedelta64(1, "us"),
         "user_id": 3, "event_type": "purchase", "value": 1.0, "props": ""},
        # u4: purchase with no click of its own (u1's click must not
        # leak across users)
        ev(11, "2024-01-01T00:01:00", 4, "purchase"),
    ]
    out = tmp_path / "sf"
    out.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(out / "events.parquet"))
    df = interval_join(str(out), "click", "purchase", 1800).to_pandas() \
        .sort_values(["l_event_id", "r_event_id"]).reset_index(drop=True)
    assert df[["l_event_id", "r_event_id"]].values.tolist() == \
        [[1, 2], [5, 8], [6, 8]]
    assert df["gap_us"].tolist() == [1800 * 10**6, 1200 * 10**6,
                                     600 * 10**6]


def test_interval_join_sql_and_partition_invariant(ray_session):
    """Kernel == the SQL band-join definition on the real corpus, at 1
    and 7 hash partitions (per-user co-location is the only
    requirement the kernel relies on)."""
    import duckdb

    from linkinator_ray.pipelines.events import interval_join
    want = duckdb.sql(f"""
        SELECT a.event_id AS l_event_id, b.event_id AS r_event_id,
               (epoch_us(b.ts) - epoch_us(a.ts))::BIGINT AS gap_us
        FROM '{SF}/events.parquet' a JOIN '{SF}/events.parquet' b
          ON a.user_id = b.user_id
         AND a.event_type = 'click' AND b.event_type = 'purchase'
         AND a.ts < b.ts
         AND epoch_us(b.ts) - epoch_us(a.ts) <= 1800 * 1000000
        ORDER BY 1, 2""").df()
    for parts in (1, 7):
        got = interval_join(SF, "click", "purchase", 1800,
                            num_parts=parts).to_pandas() \
            .sort_values(["l_event_id", "r_event_id"]) \
            .reset_index(drop=True)[want.columns.tolist()]
        assert got.astype("int64").values.tolist() == \
            want.astype("int64").values.tolist(), parts


def test_user_running_stats_planted(ray_session, tmp_path):
    """row_number/lag/running-sum semantics: (ts, event_id) tiebreak,
    gap -1 on each user's first event, cum_marks inclusive of the
    current row."""
    import pyarrow.parquet as pq

    from linkinator_ray.pipelines.events import user_running_stats

    def ev(eid, ts_s, uid, typ):
        return {"event_id": eid, "ts": np.datetime64(ts_s, "us"),
                "user_id": uid, "event_type": typ, "value": 1.0,
                "props": ""}

    rows = [
        # u1: purchase first (cum 1 at row 1), tie at 00:01 broken by
        # event_id (3 before 5), gap 0 between the tied rows
        ev(2, "2024-01-01T00:00:00", 1, "purchase"),
        ev(5, "2024-01-01T00:01:00", 1, "view"),
        ev(3, "2024-01-01T00:01:00", 1, "purchase"),
        # u2: single event, not a purchase
        ev(4, "2024-01-01T00:00:00", 2, "click"),
    ]
    out = tmp_path / "sf"
    out.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(out / "events.parquet"))
    df = user_running_stats(str(out), "purchase").to_pandas() \
        .set_index("event_id").sort_index()
    assert df.loc[2].tolist() == [1, -1, 1]          # row 1, first, cum 1
    assert df.loc[3].tolist() == [2, 60 * 10**6, 2]  # tie: eid 3 < 5
    assert df.loc[5].tolist() == [3, 0, 2]           # gap 0 to the tie
    assert df.loc[4].tolist() == [1, -1, 0]          # u2: no marks


def test_user_running_stats_sql_and_partition_invariant(ray_session):
    import duckdb

    from linkinator_ray.pipelines.events import user_running_stats
    want = duckdb.sql(f"""
        SELECT event_id, row_number() OVER w ::BIGINT AS row_num,
               coalesce(epoch_us(ts) - lag(epoch_us(ts)) OVER w,
                        -1)::BIGINT AS gap_us,
               sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_marks
        FROM '{SF}/events.parquet'
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY event_id""").df()
    for parts in (1, 7):
        got = user_running_stats(SF, "purchase", num_parts=parts) \
            .to_pandas().sort_values("event_id") \
            .reset_index(drop=True)[want.columns.tolist()]
        assert got.astype("int64").values.tolist() == \
            want.astype("int64").values.tolist(), parts


def test_profile_table_planted_edges(ray_session, tmp_path):
    """Typed encodings: NaN doubles profile as NULL, string lo/hi are
    BYTE lengths (unicode > codepoints), doubles range in floored
    cents (negative values floor DOWN), all-NULL columns profile as
    n=0 / lo=hi=0, distinct counts the canonical encoding."""
    import pyarrow.parquet as pq

    from linkinator_ray.pipelines.profile import profile_table
    t = pa.table({
        "i": pa.array([3, None, -5, 3], pa.int64()),
        "d": pa.array([1.005, float("nan"), -0.011, None], pa.float64()),
        "s": pa.array(["héllo", "", None, "ab"], pa.string()),
        "z": pa.array([None] * 4, pa.int64()),
        "ts": pa.array([1, 2, 2, None], pa.timestamp("us")),
    })
    out = tmp_path / "sf"
    out.mkdir()
    pq.write_table(t, str(out / "t.parquet"))
    df = profile_table(str(out), "t").set_index("col")
    assert df.loc["i"].tolist() == [3, 1, 2, -5, 3]
    # d: NaN -> NULL (n=2, nulls=2); cents floor(1.005*100)=100,
    # floor(-0.011*100)=-2 (floor goes DOWN); distinct cents = 2
    assert df.loc["d"].tolist() == [2, 2, 2, -2, 100]
    # s: byte lengths — "héllo" is 6 BYTES; distinct raw strings = 3
    assert df.loc["s"].tolist() == [3, 1, 3, 0, 6]
    assert df.loc["z"].tolist() == [0, 4, 0, 0, 0]
    assert df.loc["ts"].tolist() == [3, 1, 2, 1, 2]


def test_profile_table_sql_and_partition_invariant(ray_session):
    """Ray profile == the generated DuckDB oracle on lineitem (all four
    type families), at 1 and 7 hash partitions."""
    import duckdb
    import pyarrow.parquet as pq

    from linkinator_ray.pipelines.profile import (profile_oracle_sql,
                                                  profile_table)
    schema = pq.read_schema(f"{SF}/lineitem.parquet")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * "
                f"FROM '{SF}/lineitem.parquet'")
    want = con.execute(profile_oracle_sql("lineitem", schema)).df() \
        .sort_values("col").reset_index(drop=True)
    for parts in (1, 7):
        got = profile_table(SF, "lineitem", num_parts=parts) \
            .reset_index(drop=True)
        assert got[want.columns.tolist()].equals(want), parts


def test_top_docs_per_lang_planted(ray_session, tmp_path):
    """Grouped top-k semantics: n_chars DESC wins, doc_id breaks ties
    ASC, a lang with fewer than k docs returns them all, ranks are
    1..k per lang — invariant across partial-batch boundaries."""
    import pyarrow.parquet as pq

    from linkinator_ray.pipelines.text import top_docs_per_lang
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "lang": pa.array(["en", "en", "en", "en", "fr", "fr"]),
        # en: 4 docs, tie at 100 between doc 2 and doc 3
        "n_chars": pa.array([50, 100, 100, 70, 9, 8], pa.int64()),
    })
    out = tmp_path / "sf"
    out.mkdir()
    pq.write_table(t, str(out / "documents.parquet"))
    df = top_docs_per_lang(str(out), k=2).to_pandas() \
        .sort_values(["lang", "rank"]).reset_index(drop=True)
    assert df[df["lang"] == "en"]["doc_id"].tolist() == [2, 3]
    assert df[df["lang"] == "fr"]["doc_id"].tolist() == [5, 6]
    assert df["rank"].tolist() == [1, 2, 1, 2]


def test_global_rank_ties_and_partition_invariance(ray_session, tmp_path):
    """Order-statistics rank: repeated n_chars values rank by doc_id
    within the value run; the full ranking is a permutation of 1..N and
    identical at 1 and 7 partitions (partitioning must not leak into
    the result)."""
    import pyarrow.parquet as pq

    from linkinator_ray.pipelines.text import global_rank
    ids = np.arange(20, dtype=np.int64)
    n_chars = (ids % 4) * 10  # heavy ties: only 4 distinct values
    t = pa.table({"doc_id": pa.array(ids), "n_chars": pa.array(n_chars)})
    out = tmp_path / "sf"
    out.mkdir()
    pq.write_table(t, str(out / "documents.parquet"))
    want = pd.DataFrame({"doc_id": ids, "n_chars": n_chars}) \
        .sort_values(["n_chars", "doc_id"], ascending=[False, True])
    want["rank"] = np.arange(1, 21, dtype=np.int64)
    want = want.sort_values("doc_id").reset_index(drop=True)
    for parts in (1, 7):
        df = global_rank(str(out), num_parts=parts).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert df[["doc_id", "n_chars", "rank"]].equals(want), parts


def test_corpus_diff_planted_normalized(ray_session, tmp_path):
    """Snapshot diff semantics: an A-side doc whose NORMALIZED text
    (case/whitespace variant) exists in B is NOT new; a genuinely new
    A-side doc is; B-side docs never appear; A-internal duplicates are
    each reported (row-level diff, not dedup)."""
    import pyarrow.parquet as pq

    from linkinator_ray.pipelines.dedup import corpus_diff
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 5, 7], pa.int64()),
        "text": pa.array([
            "Hello  World",   # B (even): the previous snapshot
            "hello world",    # A: normalization-variant of doc 0 -> old
            "shared exact",   # B
            "brand new doc",  # A: genuinely new
            "shared exact",   # A: exact copy of doc 2 -> old
            "brand new doc",  # A: internal dup of doc 3 -> BOTH reported
        ]),
    })
    out = tmp_path / "sf"
    out.mkdir()
    pq.write_table(t, str(out / "documents.parquet"))
    got = sorted(corpus_diff(str(out)).to_pandas()["doc_id"].tolist())
    assert got == [3, 7]


def test_profile_oracle_sql_hostile_identifiers(ray_session, tmp_path):
    """Generated oracle SQL quotes identifiers: a column named with a
    space, an embedded double-quote, or a reserved word must still
    produce runnable DuckDB SQL that matches the Ray-side profile
    (which already handled such schemas)."""
    import duckdb
    import pyarrow.parquet as pq

    from linkinator_ray.pipelines.profile import (profile_oracle_sql,
                                                  profile_table)
    t = pa.table({
        "col with space": pa.array([1, 2, 2, None], pa.int64()),
        'qu"ote': pa.array(["a", "bb", None, "a"], pa.string()),
        "select": pa.array([0.5, None, 1.25, 0.5], pa.float64()),
    })
    out = tmp_path / "sf"
    out.mkdir()
    pq.write_table(t, str(out / "weird.parquet"))
    con = duckdb.connect()
    con.execute(f"""CREATE VIEW "weird" AS SELECT *
                    FROM '{out / "weird.parquet"}'""")
    want = con.execute(profile_oracle_sql("weird", t.schema)).df() \
        .sort_values("col").reset_index(drop=True)
    got = profile_table(str(out), "weird").reset_index(drop=True)
    assert got[want.columns.tolist()].equals(want)


def test_prepare_corpus_planted_semantics(ray_session, tmp_path):
    """Composition semantics: normalization-VARIANT copies (case /
    whitespace / combining-vs-precomposed) collapse to one kept doc
    attributed to the min-doc_id keeper's language; quality gating
    runs on the NORMALIZED text; dup counting is per distinct text."""
    import pyarrow.parquet as pq

    from linkinator_ray.pipelines.text import prepare_corpus
    base = "the quick brown fox jumps over the lazy dog " * 3  # 27 tokens
    rows = [
        # three variants of one doc: keeper is doc 1 (lang en)
        {"doc_id": 1, "lang": "en", "text": base},
        {"doc_id": 2, "lang": "de", "text": base.upper()},
        {"doc_id": 3, "lang": "en", "text": "  " + base.replace(" ", "  ")},
        # distinct doc, lang de
        {"doc_id": 4, "lang": "de", "text": "ein " + base},
        # fails quality: too short after normalization
        {"doc_id": 5, "lang": "en", "text": "tiny doc"},
        # fails quality: too little alpha
        {"doc_id": 6, "lang": "en", "text": "1 2 3 4 5 " * 6},
    ]
    out = tmp_path / "sf"
    out.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(out / "documents.parquet"))
    df = prepare_corpus(str(out)).to_pandas().set_index("lang").sort_index()
    # en: the collapsed trio -> 1 kept (27 tokens), 2 dups dropped
    assert df.loc["en"].tolist() == [1, 27, 2]
    # de: doc 4 only (28 tokens), no dups
    assert df.loc["de"].tolist() == [1, 28, 0]
    assert set(df.index) == {"en", "de"}  # quality-failed docs gone


def test_prepare_corpus_sql_and_partition_invariant(ray_session):
    import duckdb

    from linkinator_ray.pipelines.text import prepare_corpus
    want = duckdb.sql(rf"""
        WITH norm AS (
          SELECT doc_id, lang,
                 trim(regexp_replace(lower(nfc_normalize(text)),
                      '\s+', ' ', 'g')) AS t
          FROM '{SF}/documents.parquet'
        ), q AS (
          SELECT doc_id, lang, t,
                 len(string_split_regex(t, '\s+'))::BIGINT AS n_tokens,
                 (1000000 * length(regexp_replace(t, '[^A-Za-z]', '', 'g'))
                  // greatest(length(t), 1))::BIGINT AS alpha_ppm
          FROM norm
        ), pass AS (
          SELECT * FROM q
          WHERE n_tokens BETWEEN 20 AND 1000 AND alpha_ppm >= 500000
        ), grp AS (
          SELECT arg_min(lang, doc_id) AS lang, min(n_tokens) AS n_tokens,
                 count(*) AS grp_n
          FROM pass GROUP BY md5(t)
        )
        SELECT lang, count(*)::BIGINT AS n_kept,
               sum(n_tokens)::BIGINT AS kept_tokens,
               sum(grp_n - 1)::BIGINT AS n_dup_dropped
        FROM grp GROUP BY lang ORDER BY lang""").df()
    for parts in (1, 7):
        got = prepare_corpus(SF, num_parts=parts).to_pandas() \
            .sort_values("lang").reset_index(drop=True)[
                want.columns.tolist()]
        assert got.astype(object).equals(want.astype(object)), parts


def test_media_decode_avi_real():
    """The REAL video path: a hand-built uncompressed AVI decodes to
    its true frame count / dimensions / cadence / mean pixel."""
    from linkinator_ray.pipelines.multimodal import (decode_avi,
                                                     decode_real,
                                                     encode_avi)
    w, h = 4, 3
    frames = [bytes((i * 10 + j) % 256 for j in range(w * h))
              for i in range(6)]
    payload = encode_avi(frames, w, h, us_per_frame=40_000)  # 25 fps
    f = decode_avi(payload)
    assert f["n_frames"] == 6
    assert (f["width"], f["height"]) == (w, h)
    assert f["fps_milli"] == 25_000
    raw = b"".join(frames)
    assert f["mean_milli"] == (sum(raw) * 1000 + len(raw) // 2) // len(raw)
    assert decode_real(payload, "video") == f
    with pytest.raises(ValueError):
        decode_avi(b"RIFFxxxxAVI garbage-no-headers")
    with pytest.raises(ValueError):
        decode_avi(b"\x00" * 24)


def test_media_decoder_real_avi_in_batch(ray_session):
    """MediaDecoder detects a genuine AVI payload inside a batch and
    emits REAL frame features; stub video rows keep the deterministic
    n_bytes//32 fake."""
    from linkinator_ray.pipelines.multimodal import MediaDecoder, encode_avi
    frames = [bytes([i] * 12) for i in range(8)]
    payload = encode_avi(frames, 4, 3)
    stub = b"\x00" * 64
    batch = pa.table({
        "media_id": pa.array([1, 2], pa.int64()),
        "kind": pa.array(["video", "video"], pa.string()),
        "payload": pa.array([payload, stub], pa.binary()),
    })
    out = MediaDecoder(frame_sample_rate=4)(batch).to_pandas()
    real = out[out["media_id"] == 1].iloc[0]
    fake = out[out["media_id"] == 2].iloc[0]
    assert bool(real["decoded_real"]) and not bool(fake["decoded_real"])
    assert real["n_frames"] == 8
    assert real["sampled_frames"] == 2
    assert real["rms_milli"] == 3500  # mean of 0..7 over equal frames
    assert fake["n_frames"] == 64 // 32  # stub path unchanged


def test_interval_join_kernel_hypothesis():
    """Property test: the searchsorted band-join kernel equals the
    O(n^2) brute-force pair set on random event frames (random users,
    clustered timestamps, duplicate ts, single-type users)."""
    from hypothesis import given, settings, strategies as st

    from linkinator_ray.pipelines.events import _interval_join_kernel
    WIN = 50  # us

    ev = st.tuples(st.integers(0, 5),          # user
                   st.integers(0, 200),        # ts offset (us)
                   st.sampled_from(["L", "R", "X"]))

    @settings(max_examples=200, deadline=None)
    @given(st.lists(ev, min_size=0, max_size=40))
    def run(rows):
        df = pd.DataFrame({
            "event_id": np.arange(len(rows), dtype=np.int64),
            "user_id": np.array([r[0] for r in rows], dtype=np.int64),
            "ts": np.array([r[1] for r in rows], dtype="datetime64[us]"),
            "event_type": [r[2] for r in rows]})
        got = _interval_join_kernel(df, "L", "R", WIN)
        got_set = set(map(tuple, got[["l_event_id", "r_event_id",
                                      "gap_us"]].values.tolist()))
        want = set()
        for i, (au, at, ak) in enumerate(rows):
            if ak != "L":
                continue
            for j, (bu, bt, bk) in enumerate(rows):
                if bk == "R" and au == bu and at < bt <= at + WIN:
                    want.add((i, j, bt - at))
        assert got_set == want

    run()


def test_running_stats_kernel_hypothesis():
    """Property test: the segmented window-function kernel equals the
    pandas groupby reference (cumcount / diff / cumsum) on random
    frames with timestamp ties."""
    from hypothesis import given, settings, strategies as st

    from linkinator_ray.pipelines.events import _running_stats_kernel

    ev = st.tuples(st.integers(0, 4), st.integers(0, 50),
                   st.sampled_from(["a", "m"]))

    @settings(max_examples=200, deadline=None)
    @given(st.lists(ev, min_size=1, max_size=40))
    def run(rows):
        df = pd.DataFrame({
            "event_id": np.arange(len(rows), dtype=np.int64),
            "user_id": np.array([r[0] for r in rows], dtype=np.int64),
            "ts": np.array([r[1] for r in rows], dtype="datetime64[us]"),
            "event_type": [r[2] for r in rows]})
        got = _running_stats_kernel(df, "m").sort_values("event_id") \
            .reset_index(drop=True)
        ref = df.copy()
        ref["e"] = ref["ts"].astype("datetime64[us]").astype(np.int64)
        ref = ref.sort_values(["user_id", "e", "event_id"],
                              kind="stable").reset_index(drop=True)
        g = ref.groupby("user_id", sort=False)
        ref["row_num"] = g.cumcount() + 1
        ref["gap_us"] = g["e"].diff().fillna(-1).astype(np.int64)
        ref["cum_marks"] = (ref["event_type"] == "m").astype(np.int64) \
            .groupby(ref["user_id"]).cumsum()
        ref = ref.sort_values("event_id").reset_index(drop=True)
        for c in ("row_num", "gap_us", "cum_marks"):
            assert got[c].tolist() == ref[c].tolist(), c

    run()


def test_media_decode_avi_truncated_header_is_valueerror():
    """A truncated avih must surface as ValueError (the decoder-batch
    fallback contract), never struct.error."""
    import struct

    from linkinator_ray.pipelines.multimodal import decode_avi
    payload = (b"RIFF" + struct.pack("<I", 20) + b"AVI "
               + b"avih" + struct.pack("<I", 8) + b"\x01" * 8)
    with pytest.raises(ValueError, match="truncated"):
        decode_avi(payload)


def test_profile_table_lo_hi_exact_above_2_53_with_nulls(ray_session,
                                                         tmp_path):
    """An all-NULL column must not drag the int64 lo/hi column through
    float64 (pandas null coercion): ranges above 2^53 stay bit-exact."""
    import pyarrow.parquet as pq

    from linkinator_ray.pipelines.profile import profile_table
    big = (1 << 62) + 1  # float64 would round this
    t = pa.table({
        "id": pa.array([big, big - 3], pa.int64()),
        "z": pa.array([None, None], pa.int64()),
    })
    out = tmp_path / "sf"
    out.mkdir()
    pq.write_table(t, str(out / "t.parquet"))
    df = profile_table(str(out), "t").set_index("col")
    assert df.loc["id", "lo"] == big - 3 and df.loc["id", "hi"] == big
    assert df.loc["z"].tolist() == [0, 2, 0, 0, 0]


def test_profile_table_bool_and_date32(ray_session, tmp_path):
    """bool (0/1 range) and date32 (epoch-day range) columns profile;
    an unsupported type fails fast naming the column."""
    import datetime

    import pyarrow.parquet as pq

    from linkinator_ray.pipelines.profile import (profile_oracle_sql,
                                                  profile_table)
    t = pa.table({
        "b": pa.array([True, False, True, None], pa.bool_()),
        "d": pa.array([datetime.date(1970, 1, 2),
                       datetime.date(2024, 1, 1), None, None],
                      pa.date32()),
    })
    out = tmp_path / "sf"
    out.mkdir()
    pq.write_table(t, str(out / "t.parquet"))
    df = profile_table(str(out), "t").set_index("col")
    assert df.loc["b"].tolist() == [3, 1, 2, 0, 1]
    days_2024 = (datetime.date(2024, 1, 1)
                 - datetime.date(1970, 1, 1)).days
    assert df.loc["d"].tolist() == [2, 2, 2, 1, days_2024]
    # the generated SQL agrees cell-for-cell
    import duckdb
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM '{out}/t.parquet'")
    want = con.execute(profile_oracle_sql(
        "t", pq.read_schema(str(out / "t.parquet")))).df() \
        .sort_values("col").reset_index(drop=True)
    got = df.reset_index()
    assert got[want.columns.tolist()].astype(object) \
        .equals(want.astype(object))
    # unsupported type: fail fast, name the column
    t2 = pa.table({"x": pa.array([b"ab"], pa.binary())})
    pq.write_table(t2, str(out / "t2.parquet"))
    with pytest.raises(NotImplementedError, match="'x'"):
        profile_table(str(out), "t2")


def test_media_decode_avi_hostile_payloads():
    """A deep nested-LIST bomb is a clean reject (never RecursionError
    escaping the decoder's ValueError contract), frame chunks OUTSIDE
    the movi LIST don't count, and a second stream's frames don't skew
    stream-00 features."""
    import struct

    from linkinator_ray.pipelines.multimodal import decode_avi, encode_avi

    # 5000 nested LISTs, no headers -> ValueError (missing avih)
    bomb = b"LIST" + struct.pack("<I", 0xFFFFFF) + b"junk"
    payload = b"RIFF" + struct.pack("<I", 0xFFFFFF) + b"AVI " + bomb * 5000
    with pytest.raises(ValueError):
        decode_avi(payload)

    # frames outside movi (e.g. an idx1-resident 00db) must not count;
    # a 01db second-stream frame inside movi must not count either
    base = encode_avi([b"\x10" * 12, b"\x10" * 12], 4, 3)

    def chunk(fourcc, data):
        pad = b"\x00" if len(data) % 2 else b""
        return fourcc + struct.pack("<I", len(data)) + data + pad

    stray = chunk(b"00db", b"\xff" * 12)          # outside any movi
    second = chunk(b"LIST", b"movi" + chunk(b"01db", b"\xff" * 12))
    doctored = base + stray + second
    # re-stamp the RIFF size so the walk covers the appended bytes
    doctored = (doctored[:4]
                + struct.pack("<I", len(doctored) - 8) + doctored[8:])
    f = decode_avi(doctored)
    assert f["n_frames"] == 2          # only stream-00 frames in movi
    assert f["mean_milli"] == 16_000   # \x10 = 16; \xff frames excluded


def test_local_supplier_volume_matches_duckdb(ray_session):
    """Q5 shape end-to-end vs the registered oracle: 3 hash exchanges,
    nation-equality post-join filter, exact-integer revenue."""
    import duckdb
    import __ray_entry__ as entrymod
    from linkinator_ray.pipelines.tpch import local_supplier_volume
    got = local_supplier_volume(SF).to_pandas().sort_values(
        "n_name").reset_index(drop=True)
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem", "supplier", "nation",
              "region"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    want = con.sql(entrymod.oracle_sql()["local_supplier_volume"]).df()
    assert got["n_name"].tolist() == want["n_name"].tolist()
    assert got["revenue_u"].tolist() == want["revenue_u"].tolist()


def test_brand_revenue_matches_duckdb(ray_session):
    """Q14 shape end-to-end vs the registered oracle: per-partkey
    combiner, one part join, conditional promo aggregate."""
    import duckdb
    import __ray_entry__ as entrymod
    from linkinator_ray.pipelines.tpch import brand_revenue
    got = brand_revenue(SF).to_pandas().sort_values(
        "p_brand").reset_index(drop=True)
    con = duckdb.connect()
    for t in ("lineitem", "part"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    want = con.sql(entrymod.oracle_sql()["brand_revenue"]).df()
    assert got["p_brand"].tolist() == want["p_brand"].tolist()
    assert got["revenue_u"].tolist() == want["revenue_u"].tolist()
    assert got["promo_revenue_u"].tolist() == want["promo_revenue_u"].tolist()
    assert got["n_items"].tolist() == want["n_items"].tolist()
    # promo share is a strict subset of revenue
    assert (got["promo_revenue_u"] <= got["revenue_u"]).all()


def test_semantic_dedup_planted(ray_session, tmp_path):
    """SemDeDup semantics: two planted near-identical copies of
    existing vectors (one per region of the space) must be dropped with
    dup_of = their lower-id anchor; well-separated vectors survive."""
    import pyarrow.parquet as pq
    from linkinator_ray.pipelines.similarity import semantic_dedup
    rng = np.random.default_rng(11)
    # two well-separated blobs so k-means has real structure
    a = rng.standard_normal((50, 32)).astype(np.float32) + 8.0
    b = rng.standard_normal((50, 32)).astype(np.float32) - 8.0
    vecs = np.vstack([a, b])
    rows = [{"vec_id": i, "embedding": vecs[i].tolist(), "label": 0}
            for i in range(100)]
    rows.append({"vec_id": 500,
                 "embedding": (vecs[7] * 1.0001).tolist(), "label": 0})
    rows.append({"vec_id": 501,
                 "embedding": (vecs[60] * 1.0002).tolist(), "label": 0})
    out = tmp_path / "sf"
    out.mkdir()
    pq.write_table(pa.Table.from_pylist(rows),
                   str(out / "embeddings.parquet"))
    drops = semantic_dedup(str(out), k=4, iters=4,
                           threshold=0.999).to_pandas()
    by_id = drops.set_index("vec_id")["dup_of"].to_dict()
    assert by_id.get(500) == 7
    assert by_id.get(501) == 60
    # nothing else is that similar at 0.999
    assert set(drops["vec_id"]) == {500, 501}


def test_semantic_dedup_cluster_cap(ray_session, tmp_path):
    """A cluster larger than cluster_cap fails loudly instead of
    silently going O(n²)."""
    import pytest as _pytest
    import pyarrow.parquet as pq
    from linkinator_ray.pipelines.similarity import semantic_dedup
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((40, 8)).astype(np.float32)
    rows = [{"vec_id": i, "embedding": vecs[i].tolist(), "label": 0}
            for i in range(40)]
    out = tmp_path / "sf"
    out.mkdir()
    pq.write_table(pa.Table.from_pylist(rows),
                   str(out / "embeddings.parquet"))
    with _pytest.raises(Exception, match="cluster_cap"):
        semantic_dedup(str(out), k=1, iters=1, threshold=0.99,
                       cluster_cap=10).to_pandas()


def test_bigram_counts_planted(ray_session, tmp_path):
    """Planted corpus: the repeated in-doc bigram wins; bigrams never
    span documents; single-token docs contribute nothing."""
    import pyarrow.parquet as pq
    from linkinator_ray.pipelines.text import bigram_counts
    rows = [
        {"doc_id": 0, "text": "a b a b a b"},   # "a b" x3, "b a" x2
        {"doc_id": 1, "text": "b"},              # no bigram
        {"doc_id": 2, "text": "c"},              # "b c" must NOT appear
        {"doc_id": 3, "text": "a b"},            # "a b" x1
    ]
    out = tmp_path / "sf"
    out.mkdir()
    pq.write_table(pa.Table.from_pylist(rows),
                   str(out / "documents.parquet"))
    got = bigram_counts(str(out), k=10).to_pandas()
    counts = dict(zip(got["bigram"], got["n"]))
    assert counts == {"a b": 4, "b a": 2}


def test_rollup_orders_levels_consistent(ray_session):
    """Rollup invariants: the 'ALL' subtotals equal the sum of their
    fine rows, the grand total equals everything, and the whole table
    matches the GROUP BY ROLLUP oracle."""
    import duckdb
    import __ray_entry__ as entrymod
    from linkinator_ray.pipelines.tpch import rollup_orders
    got = rollup_orders(SF).to_pandas()
    fine = got[(got.o_orderpriority != "ALL") & (got.o_orderstatus != "ALL")]
    mid = got[(got.o_orderpriority != "ALL") & (got.o_orderstatus == "ALL")]
    top = got[(got.o_orderpriority == "ALL")]
    assert len(top) == 1
    assert top.n_orders.iloc[0] == fine.n_orders.sum()
    assert top.total_cents.iloc[0] == fine.total_cents.sum()
    for _, r in mid.iterrows():
        f = fine[fine.o_orderpriority == r.o_orderpriority]
        assert r.n_orders == f.n_orders.sum()
        assert r.total_cents == f.total_cents.sum()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM '{SF}/orders.parquet'")
    want = con.sql(entrymod.oracle_sql()["rollup_orders"]).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        want.astype({"total_cents": "int64", "n_orders": "int64"}))


def test_pivot_events_planted(ray_session, tmp_path):
    """Pivot counts on a planted events table: exact wide counts, users
    missing a type get zero, unknown types are ignored (fixed contract)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from linkinator_ray.pipelines.events import pivot_events
    t = pa.table({
        "event_id": pa.array(range(7), pa.int64()),
        "ts": pa.array([0] * 7, pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 2, 2, 3, 3], pa.int64()),
        "event_type": ["click", "click", "view", "purchase", "click",
                       "weird", "signup"],
        "value": pa.array([0.0] * 7),
        "props": [""] * 7,
    })
    pq.write_table(t, tmp_path / "events.parquet")
    got = pivot_events(str(tmp_path)).to_pandas().set_index("user_id")
    assert got.loc[1].to_dict() == {
        "n_click": 2, "n_error": 0, "n_purchase": 0, "n_signup": 0,
        "n_view": 1}
    assert got.loc[2].to_dict() == {
        "n_click": 1, "n_error": 0, "n_purchase": 1, "n_signup": 0,
        "n_view": 0}
    # user 3's only counted event is the signup; 'weird' is ignored
    assert got.loc[3].to_dict() == {
        "n_click": 0, "n_error": 0, "n_purchase": 0, "n_signup": 1,
        "n_view": 0}


def test_anchor_text_stats_duplicate_target_spans(ray_session, tmp_path):
    """n=12, d=2: (7d+3)%12 == 2d+1 == 5, so doc 2 emits TWO anchor
    spans to doc 5 (offsets 0 and 20) — span-level counting must see
    both, unlike the distinct edge set."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from linkinator_ray.pipelines.graph import anchor_text_stats, targets_of
    pq.write_table(pa.table({"doc_id": pa.array(range(12), pa.int64())}),
                   tmp_path / "documents.parquet")
    assert targets_of(2, 12) == [5, 6, 5]
    got = anchor_text_stats(str(tmp_path)).to_pandas().set_index("doc_id")
    # brute-force over the rule
    from collections import defaultdict
    n_links = defaultdict(int)
    sum_off = defaultdict(int)
    for d in range(12):
        if d % 13 == 7:
            continue
        for i, t in enumerate(targets_of(d, 12)):
            n_links[t] += 1
            sum_off[t] += 10 * i
    for t in n_links:
        assert got.loc[t, "n_links"] == n_links[t], t
        assert got.loc[t, "sum_offset"] == sum_off[t], t
        assert got.loc[t, "min_text"] == got.loc[t, "max_text"] == f"to-{t}"
    # doc 5 specifically carries the duplicate pair from doc 2
    assert got.loc[5, "n_links"] == n_links[5] and n_links[5] >= 2


def test_copurchase_matches_duckdb(ray_session):
    import duckdb
    import __ray_entry__ as entrymod
    from linkinator_ray.pipelines.tpch import copurchase_topk
    got = copurchase_topk(SF, k=20).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM '{SF}/lineitem.parquet'")
    want = con.sql(entrymod.oracle_sql()["copurchase_topk"]).df()
    assert got["a"].tolist() == want["a"].tolist()
    assert got["b"].tolist() == want["b"].tolist()
    assert got["n"].tolist() == want["n"].astype("int64").tolist()


def test_png_resize_roundtrip_exact():
    """encode_png(resize_nearest(png_pixels(p))) round-trips: the
    resized payload re-decodes to EXACTLY the expected gathered pixels
    (pixel-center index rule), byte-reproducibly."""
    import numpy as np
    from linkinator_ray.pipelines.multimodal import (encode_png,
                                                     png_pixels,
                                                     resize_nearest)
    payload, raw = _make_png(w=9, h=7, channels=3)
    px = png_pixels(payload)
    assert px.shape == (7, 9, 3)
    assert (px == raw.reshape(7, 9, 3)).all()
    small = resize_nearest(px, 3, 2)
    ys = ((np.arange(2) + 0.5) * 7 / 2).astype(int)
    xs = ((np.arange(3) + 0.5) * 9 / 3).astype(int)
    assert (small == px[ys][:, xs]).all()
    out = encode_png(small)
    assert (png_pixels(out) == small).all()
    assert encode_png(small) == out  # deterministic bytes


def test_media_resizer_batch(ray_session):
    """MediaResizer: genuine PNG rows resize for real; stub/audio rows
    keep deterministic stub output with resized_real False."""
    from linkinator_ray.pipelines.multimodal import (MediaResizer,
                                                     png_pixels)
    payload, _ = _make_png(w=8, h=6, channels=3)
    batch = pa.table({
        "media_id": pa.array([1, 2, 3], pa.int64()),
        "kind": pa.array(["image", "image", "audio"], pa.string()),
        "payload": pa.array([payload, b"\x00" * 64, b"\x00" * 64],
                            pa.binary()),
    })
    out = MediaResizer(dst_w=4, dst_h=2)(batch)
    df = out.to_pandas().set_index("media_id")
    assert bool(df.loc[1, "resized_real"])
    assert df.loc[1, "src_w"] == 8 and df.loc[1, "src_h"] == 6
    resized = png_pixels(df.loc[1, "payload"])
    assert resized.shape == (2, 4, 3)
    assert not bool(df.loc[2, "resized_real"])
    assert df.loc[2, "payload"] == b"" and df.loc[3, "payload"] == b""


def test_daily_top_users_planted(ray_session, tmp_path):
    """Leaderboard semantics: ties break by user_id, rank caps at k,
    day boundaries at UTC midnight."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from linkinator_ray.pipelines.events import daily_top_users
    day0 = 1704067200  # 2024-01-01 UTC
    rows = [(day0 + 10, 1)] * 3 + [(day0 + 20, 2)] * 3 + \
           [(day0 + 30, 3)] * 1 + [(day0 + 86400 + 5, 9)] * 2
    ts = pa.array([np.datetime64(t * 1_000_000, "us") for t, _ in rows],
                  pa.timestamp("us"))
    t = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": ts,
        "user_id": pa.array([u for _, u in rows], pa.int64()),
        "event_type": ["click"] * len(rows),
        "value": pa.array([0.0] * len(rows)),
        "props": [""] * len(rows)})
    pq.write_table(t, tmp_path / "events.parquet")
    got = daily_top_users(str(tmp_path), k=2).to_pandas()
    d1 = got[got.day == day0]
    assert list(zip(d1["rank"], d1.user_id, d1.n)) == [(1, 1, 3), (2, 2, 3)]
    d2 = got[got.day == day0 + 86400]
    assert list(zip(d2["rank"], d2.user_id, d2.n)) == [(1, 9, 2)]


def test_local_supplier_volume_plans_equal(ray_session):
    """The broadcast plan (small filtered-dim regime) and the 3-exchange
    plan (100 TB shape, forced via broadcast_threshold=0) must produce
    identical revenue tables."""
    from linkinator_ray.pipelines.tpch import local_supplier_volume
    a = local_supplier_volume(SF).to_pandas() \
        .sort_values("n_name").reset_index(drop=True)
    b = local_supplier_volume(SF, broadcast_threshold=0).to_pandas() \
        .sort_values("n_name").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_vocab_build_planted(ray_session, tmp_path):
    """Vocabulary semantics: doc-frequency (not occurrence) counting,
    min_doc_freq gate, dense rank under (doc_freq DESC, token ASC)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from linkinator_ray.pipelines.text import vocab_build
    docs = ["a a b c", "a b", "a d", "d x"]
    t = pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": docs,
        "lang": ["en"] * len(docs),
        "source": ["s"] * len(docs),
        "n_chars": pa.array([len(d) for d in docs], pa.int64()),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    got = vocab_build(str(tmp_path), min_doc_freq=2).to_pandas() \
        .sort_values("vocab_id").reset_index(drop=True)
    # a: df 3 (duplicate within doc counts once); b: 2; d: 2; c/x: 1 (cut)
    assert list(zip(got.token, got.doc_freq, got.vocab_id)) == [
        ("a", 3, 1), ("b", 2, 2), ("d", 2, 3)]
    # partition invariance
    got2 = vocab_build(str(tmp_path), min_doc_freq=2,
                       num_parts=7).to_pandas() \
        .sort_values("vocab_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, got2)


def test_crawl_prepare_corpus_gates_equal(ray_session):
    """Flagship composition: the broadcast gate and the semi-join gate
    must produce the same per-language summary, and only reachable OK
    pages may contribute (a reachable-broken page's text never counts)."""
    from linkinator_ray.pipelines.graph import (crawl_prepare_corpus,
                                                crawl_reachability)
    import pyarrow.compute as pc
    a = crawl_prepare_corpus(SF, gate="broadcast").to_pandas() \
        .sort_values("lang").reset_index(drop=True)
    b = crawl_prepare_corpus(SF, gate="join").to_pandas() \
        .sort_values("lang").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    reach = crawl_reachability(SF)
    n_ok = reach.filter(pc.equal(reach["state"], "OK")).num_rows
    # every kept doc is an OK page: kept+dups can never exceed OK count
    assert (a.n_kept.sum() + a.n_dup_dropped.sum()) <= n_ok
    with pytest.raises(ValueError):
        crawl_prepare_corpus(SF, gate="nope")


def test_local_supplier_volume_empty_region(ray_session):
    """An unknown region (empty filtered dims) must return zero rows on
    BOTH plans, not crash the broadcast kernels (r5 review finding:
    empty-map searchsorted indexing)."""
    from linkinator_ray.pipelines.tpch import local_supplier_volume
    a = local_supplier_volume(SF, region="NOSUCH")
    assert consume_rows(a) == 0
    b = local_supplier_volume(SF, region="NOSUCH", broadcast_threshold=0)
    assert consume_rows(b) == 0
    # empty date window: the broadcast kernels see an EMPTY order map
    # and must hit their guards, not index into a zero-length array
    c = local_supplier_volume(SF, date_from="2099-01-01",
                              date_to="2099-02-01")
    assert consume_rows(c) == 0


def consume_rows(x) -> int:
    import pyarrow as pa
    if isinstance(x, pa.Table):
        return x.num_rows
    if isinstance(x, pd.DataFrame):
        return len(x)
    return x.count()
