"""Seen-set shards, cuckoo filter, checkpoint/resume."""

import numpy as np
import pytest

from linkinator_ray.options import CheckOptions
from linkinator_ray.pipelines.crawl import LinkChecker
from linkinator_ray.sources import fixtures as fx
from linkinator_ray.state.cuckoo import CuckooFilter
from linkinator_ray.state.seen import SeenSet, SeenShard


class TestCuckooFilter:
    def test_insert_and_contains(self):
        filt = CuckooFilter(1024)
        keys = np.random.default_rng(7).integers(0, 2**63, 500, dtype=np.uint64)
        first = filt.contains_or_insert(keys)
        assert not first.any()  # all new
        again = filt.contains_or_insert(keys)
        assert again.all()  # all present now

    def test_within_batch_dups(self):
        filt = CuckooFilter(64)
        keys = np.array([1, 2, 1, 3, 2], dtype=np.uint64)
        out = filt.contains_or_insert(keys)
        assert out.tolist() == [False, False, True, False, True]

    def test_no_false_negatives_at_high_load(self):
        filt = CuckooFilter(256)
        keys = np.random.default_rng(3).integers(0, 2**63, 300, dtype=np.uint64)
        filt.contains_or_insert(keys)  # overfull → overflow set engages
        assert filt.contains(keys).all()

    def test_false_positive_rate_reasonable(self):
        filt = CuckooFilter(1 << 16)
        rng = np.random.default_rng(11)
        inserted = rng.integers(0, 2**63, 40_000, dtype=np.uint64)
        filt.contains_or_insert(inserted)
        probes = rng.integers(0, 2**63, 40_000, dtype=np.uint64)
        fresh = probes[~np.isin(probes, inserted)]
        fp = filt.contains(fresh).mean()
        assert fp < 0.01, fp

    def test_dump_restore(self):
        filt = CuckooFilter(512)
        keys = np.arange(100, dtype=np.uint64) * 7919
        filt.contains_or_insert(keys)
        clone = CuckooFilter.restore(filt.dump())
        assert clone.contains(keys).all()


class TestSeenSet:
    @pytest.mark.parametrize("mode", ["exact", "cuckoo"])
    def test_sharded_dedup(self, mode):
        seen = SeenSet(num_shards=4, mode=mode)
        keys = np.random.default_rng(5).integers(0, 2**63, 1000, dtype=np.uint64)
        assert not seen.contains_or_insert(keys).any()
        assert seen.contains_or_insert(keys).all()
        assert seen.size() == 1000

    def test_order_preserved_across_shards(self):
        seen = SeenSet(num_shards=8)
        keys = np.array([10, 11, 10, 12, 11, 13], dtype=np.uint64)
        out = seen.contains_or_insert(keys)
        assert out.tolist() == [False, False, True, False, True, False]

    def test_dump_restore_roundtrip(self):
        seen = SeenSet(num_shards=3)
        keys = np.arange(50, dtype=np.uint64) * 104729
        seen.contains_or_insert(keys)
        tables = seen.dump_tables()
        fresh = SeenSet(num_shards=3)
        fresh.restore_tables(tables)
        assert fresh.contains_or_insert(keys).all()

    def test_shard_exact_vs_cuckoo_equivalent(self):
        keys = np.random.default_rng(9).integers(0, 2**63, 2000, dtype=np.uint64)
        exact = SeenShard(0, "exact")
        cuckoo = SeenShard(0, "cuckoo", capacity=1 << 14)
        assert (exact.contains_or_insert(keys) == cuckoo.contains_or_insert(keys)).all()


class TestCheckpointResume:
    def test_resume_equivalence(self, tmp_path):
        """Kill after round k, resume, same final result sets
        (SURVEY.md §5 test 6)."""
        fixture = fx.repeated_broken_link()
        opts = dict(fixture.options)

        full = LinkChecker(CheckOptions(paths=fixture.seeds, **opts),
                           fixture.documents, fixture.http_map).check()

        ckpt_dir = str(tmp_path / "ckpt")
        opts_ck = dict(opts, checkpoint_dir=ckpt_dir, max_rounds=2)
        partial = LinkChecker(CheckOptions(paths=fixture.seeds, **opts_ck),
                              fixture.documents, fixture.http_map).check()
        assert partial.results.num_rows < full.results.num_rows  # truly killed early

        opts_res = dict(opts, checkpoint_dir=ckpt_dir)
        resumed_checker = LinkChecker(CheckOptions(paths=fixture.seeds, **opts_res),
                                      fixture.documents, fixture.http_map)
        resumed = resumed_checker.check(resume_from=ckpt_dir)

        def key_set(res):
            return {(r["url"], r["state"], r["status"], r["parent"])
                    for r in res.results.to_pylist()}
        assert key_set(resumed) == key_set(full)
        assert resumed.passed == full.passed

    def test_manifest_lineage(self, tmp_path):
        import json
        import os
        fixture = fx.recurse()
        ckpt_dir = str(tmp_path / "ck")
        opts = dict(fixture.options, checkpoint_dir=ckpt_dir)
        LinkChecker(CheckOptions(paths=fixture.seeds, **opts),
                    fixture.documents, fixture.http_map).check()
        rounds = sorted(d for d in os.listdir(ckpt_dir) if d.startswith("round_"))
        assert len(rounds) >= 2
        with open(os.path.join(ckpt_dir, rounds[-1], "manifest.json")) as f:
            manifest = json.load(f)
        assert manifest["round"] == len(rounds)
        assert manifest["parent_round"] == manifest["round"] - 1
        assert "row_counts" in manifest and "counters" in manifest


class TestPipelinedCheckpoint:
    def test_pipelined_resume(self, ray_session, tmp_path):
        """Kill a pipelined run early (max_rounds caps processed batches),
        resume from its checkpoint, same final sets as a clean run."""
        from linkinator_ray.sources.synth import synth_crawl_corpus
        docs, seeds, expected_seen, _ = synth_crawl_corpus(
            num_hosts=2, docs_per_host=400)
        base = dict(paths=seeds, recurse=True, fetch_concurrency=2,
                    seen_shards=2)
        full = LinkChecker(CheckOptions(**base), docs, [],
                           multi_host=True, use_ray=True).check()
        ck = str(tmp_path / "ck")
        partial = LinkChecker(
            CheckOptions(**base, pipelined=True, checkpoint_dir=ck,
                         batch_size=64, max_rounds=10_000),
            docs, [], multi_host=True, use_ray=True)
        # force an early stop after enough batches to checkpoint once
        orig = partial._process_fetched
        calls = {"n": 0}
        def bomb(*a, **k):
            calls["n"] += 1
            if calls["n"] > 12:
                raise KeyboardInterrupt
            return orig(*a, **k)
        partial._process_fetched = bomb
        try:
            partial.check()
        except KeyboardInterrupt:
            pass
        import os
        assert os.path.isdir(ck) and os.listdir(ck), "no checkpoint written"
        resumed = LinkChecker(CheckOptions(**base), docs, [],
                              multi_host=True, use_ray=True).check(
            resume_from=ck)
        def urls_states(res):
            return {(r["url"], r["state"], r["status"])
                    for r in res.results.to_pylist()}
        assert urls_states(resumed) == urls_states(full)
        assert resumed.stats["seen_urls"] == expected_seen


class TestSpillResume:
    def test_spill_state_survives_resume(self, tmp_path):
        """Crash/resume with a streaming results_dir: a resumed run must
        continue parquet part numbering (not overwrite part_00000) and
        keep earlier spills' BROKEN rows available to the J1
        duplicate-broken join."""
        import os
        import pyarrow.parquet as pq
        fixture = fx.repeated_broken_link()
        opts = dict(fixture.options)

        def run(extra, resume_from=None):
            checker = LinkChecker(
                CheckOptions(paths=fixture.seeds, **opts, **extra),
                fixture.documents, fixture.http_map)
            return checker, checker.check(resume_from=resume_from)

        # ground truth: full run with spilling
        full_dir = str(tmp_path / "full")
        _, full = run({"results_dir": full_dir, "results_flush_rows": 1})

        ck = str(tmp_path / "ck")
        res_dir = str(tmp_path / "res")
        _, partial = run({"results_dir": res_dir, "results_flush_rows": 1,
                          "checkpoint_dir": ck, "max_rounds": 2})
        parts_before = sorted(os.listdir(res_dir))
        assert parts_before, "expected spilled parts from the partial run"

        checker, resumed = run({"results_dir": res_dir, "results_flush_rows": 1,
                                "checkpoint_dir": ck}, resume_from=ck)
        parts_after = sorted(os.listdir(res_dir))
        # old parts still present, new parts appended after them
        assert set(parts_before) <= set(parts_after)
        assert checker._spill_part >= len(parts_before)

        def key_set(table):
            return {(r["url"], r["state"], r["status"], r["parent"])
                    for r in table.to_pylist()}

        def read_all(d):
            import pyarrow as pa
            return pa.concat_tables(
                [pq.read_table(os.path.join(d, p)) for p in sorted(os.listdir(d))])

        # full-record equivalence: spilled parts of the resumed run
        # cover the same (url,state,status,parent) set as a clean run's
        full_keys = key_set(read_all(full_dir))
        resumed_keys = key_set(read_all(res_dir))
        # resume replays the checkpointed round, so resumed may hold the
        # same keys; it must not LOSE any
        assert full_keys <= resumed_keys
        assert resumed.passed == full.passed


class TestMeshCheckpoint:
    def test_mesh_checkpoint_resume(self, ray_session, tmp_path):
        """Kill a mesh crawl mid-flight (abort after the first epoch
        snapshot), resume from its checkpoint, same final sets as a
        clean run — the driver-coordinated pause/snapshot protocol."""
        import os

        from linkinator_ray.pipelines import crawl as crawl_mod
        from linkinator_ray.sources.synth import synth_crawl_corpus
        docs, seeds, expected_seen, _ = synth_crawl_corpus(
            num_hosts=2, docs_per_host=400)
        base = dict(paths=seeds, recurse=True, fetch_concurrency=2,
                    mesh=True)
        full = LinkChecker(CheckOptions(**base), docs, [],
                           multi_host=True, use_ray=True).check()

        ck = str(tmp_path / "meshck")
        # small wire latency so the crawl cannot drain before the first
        # 0.2 s epoch fires (the bomb below needs >=1 checkpoint; results
        # are latency-independent)
        partial = LinkChecker(
            CheckOptions(**base, checkpoint_dir=ck,
                         checkpoint_interval_s=0.2, batch_size=64),
            docs, [], multi_host=True, use_ray=True,
            transport_latency_s=0.005)
        orig = crawl_mod.LinkChecker._mesh_checkpoint
        calls = {"n": 0}

        def bomb(self, nodes, epoch, num_actors, seed_rows):
            orig(self, nodes, epoch, num_actors, seed_rows)
            calls["n"] += 1
            if calls["n"] >= 1:
                raise KeyboardInterrupt
        partial._mesh_checkpoint = bomb.__get__(partial)
        try:
            partial.check()
        except KeyboardInterrupt:
            pass
        assert os.path.isdir(ck) and os.listdir(ck), "no mesh checkpoint"

        resumed = LinkChecker(CheckOptions(**base, checkpoint_dir=ck),
                              docs, [], multi_host=True,
                              use_ray=True).check(resume_from=ck)

        def key(res):
            return {(r["url"], r["state"], r["status"])
                    for r in res.results.to_pylist()}

        def broken_edges(res):
            return {(r["url"], r["parent"])
                    for r in res.results.to_pylist() if r["state"] == "BROKEN"}
        assert key(resumed) == key(full)
        assert broken_edges(resumed) == broken_edges(full)
        assert resumed.stats["seen_urls"] == expected_seen

    @pytest.mark.parametrize("seen_filter,resume_actors",
                             [("exact", 3), ("cuckoo", 3), ("exact", 1)])
    def test_mesh_elastic_resume(self, ray_session, tmp_path,
                                 seen_filter, resume_actors):
        """Kill a 2-node mesh crawl after its first epoch, resume with a
        DIFFERENT node count: the key journal re-shards the seen/edge
        filters to the new hash ranges, and the final sets match a
        clean run — for the exact filter and the cuckoo filter (whose
        blobs alone are not re-shardable), growing and shrinking."""
        import os

        from linkinator_ray.pipelines import crawl as crawl_mod
        from linkinator_ray.sources.synth import synth_crawl_corpus
        docs, seeds, expected_seen, _ = synth_crawl_corpus(
            num_hosts=2, docs_per_host=400)
        base = dict(paths=seeds, recurse=True, mesh=True,
                    seen_filter=seen_filter)
        full = LinkChecker(CheckOptions(**base, fetch_concurrency=2),
                           docs, [], multi_host=True, use_ray=True).check()

        ck = str(tmp_path / "meshck")
        # latency floor: guarantees the partial run outlives the first
        # epoch so the bomb always has a checkpoint to land on
        partial = LinkChecker(
            CheckOptions(**base, fetch_concurrency=2, checkpoint_dir=ck,
                         checkpoint_interval_s=0.2, batch_size=64),
            docs, [], multi_host=True, use_ray=True,
            transport_latency_s=0.005)
        orig = crawl_mod.LinkChecker._mesh_checkpoint
        calls = {"n": 0}

        def bomb(self, nodes, epoch, num_actors, seed_rows):
            orig(self, nodes, epoch, num_actors, seed_rows)
            calls["n"] += 1
            if calls["n"] >= 1:
                raise KeyboardInterrupt
        partial._mesh_checkpoint = bomb.__get__(partial)
        try:
            partial.check()
        except KeyboardInterrupt:
            pass
        assert os.path.isdir(ck) and os.listdir(ck), "no mesh checkpoint"

        resumed = LinkChecker(
            CheckOptions(**base, fetch_concurrency=resume_actors,
                         checkpoint_dir=ck),
            docs, [], multi_host=True, use_ray=True).check(resume_from=ck)

        def key(res):
            return {(r["url"], r["state"], r["status"])
                    for r in res.results.to_pylist()}

        def broken_edges(res):
            return {(r["url"], r["parent"])
                    for r in res.results.to_pylist() if r["state"] == "BROKEN"}
        assert key(resumed) == key(full)
        assert broken_edges(resumed) == broken_edges(full)
        assert resumed.stats["seen_urls"] == expected_seen

    def test_mesh_elastic_resume_requires_journal(self, ray_session,
                                                  tmp_path):
        """A checkpoint whose manifest carries no journal flag (legacy
        format) still refuses a different node count with a clear
        error; the same count keeps working."""
        import json
        import os

        from linkinator_ray.sources.synth import synth_crawl_corpus
        docs, seeds, _, _ = synth_crawl_corpus(num_hosts=2,
                                               docs_per_host=400)
        ck = str(tmp_path / "ck2")
        base = dict(paths=seeds, recurse=True, mesh=True)
        LinkChecker(CheckOptions(**base, fetch_concurrency=2,
                                 checkpoint_dir=ck,
                                 checkpoint_interval_s=0.3, batch_size=32),
                    docs, [], multi_host=True, use_ray=True,
                    transport_latency_s=0.005).check()
        rounds = [d for d in os.listdir(ck) if d.startswith("round_")] \
            if os.path.isdir(ck) else []
        if not rounds:
            pytest.skip("crawl finished before the first epoch fired")
        for d in rounds:  # strip the journal flag → legacy checkpoint
            mpath = os.path.join(ck, d, "manifest.json")
            with open(mpath) as f:
                m = json.load(f)
            m["extra"].pop("journal", None)
            with open(mpath, "w") as f:
                json.dump(m, f)
        with pytest.raises(ValueError, match="no key journal"):
            LinkChecker(CheckOptions(**base, fetch_concurrency=3,
                                     checkpoint_dir=ck),
                        docs, [], multi_host=True, use_ray=True) \
                .check(resume_from=ck)


class TestMeshResultsSpill:
    def test_node_local_results_spill(self, ray_session, tmp_path):
        """With results_dir set, mesh nodes spill OK/SKIPPED rows to
        partitioned parquet directly (never through the driver); the
        union of spilled parts + final in-memory results equals a
        no-spill run, and BROKEN totals stay correct."""
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        from linkinator_ray.sources.synth import synth_crawl_corpus
        docs, seeds, expected_seen, _ = synth_crawl_corpus(
            num_hosts=2, docs_per_host=300)
        base = dict(paths=seeds, recurse=True, fetch_concurrency=2,
                    mesh=True)
        full = LinkChecker(CheckOptions(**base), docs, [],
                           multi_host=True, use_ray=True).check()

        res_dir = str(tmp_path / "meshres")
        spilled = LinkChecker(
            CheckOptions(**base, results_dir=res_dir,
                         results_flush_rows=50, batch_size=64),
            docs, [], multi_host=True, use_ray=True).check()
        parts = sorted(os.listdir(res_dir))
        assert parts, "expected node-spilled parquet parts"
        assert any(p.startswith("node") for p in parts)

        tables = [pq.read_table(os.path.join(res_dir, p)) for p in parts]
        all_rows = pa.concat_tables(
            tables + [spilled.results.select(tables[0].column_names)])

        def key(table):
            return {(r["url"], r["state"], r["status"])
                    for r in table.to_pylist()}
        assert key(all_rows) == key(full.results)
        assert spilled.passed == full.passed
        assert spilled.stats["seen_urls"] == expected_seen
        # BROKEN accounting includes node-spilled rows (they are
        # retained driver-side, never node-spilled)
        assert spilled.stats["broken"] == full.stats["broken"]


class TestResumeHardening:
    """Round-4 review fixes: shard-layout-safe seen restore, stale spill
    pruning, deferral deadlines surviving a pipelined resume, cross-mode
    (mesh checkpoint -> driver) resume, and no caller-opts mutation."""

    def test_exact_seen_restore_reshards(self):
        """Exact-mode shard dumps carry raw keys: restoring a 3-shard
        checkpoint into a 5-shard set rehashes into the new layout
        instead of silently misrouting lookups."""
        seen = SeenSet(num_shards=3)
        keys = np.random.default_rng(21).integers(
            0, 2**63, 500, dtype=np.uint64)
        seen.contains_or_insert(keys)
        fresh = SeenSet(num_shards=5)
        fresh.restore_tables(seen.dump_tables())
        assert fresh.contains_or_insert(keys).all()
        assert fresh.size() == len(np.unique(keys))

    def test_cuckoo_seen_restore_mismatch_raises(self):
        """Cuckoo dumps are positional fingerprint tables — a shard-count
        mismatch must raise loudly, not corrupt membership."""
        seen = SeenSet(num_shards=3, mode="cuckoo")
        keys = np.arange(200, dtype=np.uint64) * 7919
        seen.contains_or_insert(keys)
        tables = seen.dump_tables()
        with pytest.raises(ValueError, match="re-shard"):
            SeenSet(num_shards=4, mode="cuckoo").restore_tables(tables)

    def test_prune_stale_spill_parts(self, tmp_path):
        """Parts spilled AFTER the checkpoint being resumed (driver
        part index >= spill_part, node part index >= that node's saved
        counter) are deleted; pre-checkpoint parts and foreign files
        stay; orphan .tmp files always go."""
        import os

        from linkinator_ray.pipelines.crawl import prune_stale_spill_parts
        d = tmp_path / "res"
        d.mkdir()
        names = [
            "part_00000.parquet", "part_00001.parquet",
            "part_00002.parquet",            # stale: >= spill_part 2
            "node00_part_00000.parquet",
            "node00_part_00001.parquet",     # stale: node 0 saved 1
            "node01_part_00000.parquet",     # stale: node 1 saved 0
            "node05_part_00000.parquet",     # stale: beyond saved list
            "part_00009.parquet.tmp",        # orphan tmp
            "other.txt",
        ]
        for n in names:
            (d / n).write_bytes(b"x")
        prune_stale_spill_parts(str(d), 2, [1, 0])
        assert sorted(os.listdir(d)) == [
            "node00_part_00000.parquet", "other.txt",
            "part_00000.parquet", "part_00001.parquet"]

    def test_shrink_resume_carries_node_floors(self, ray_session,
                                               tmp_path):
        """Double-crash with a mesh SHRINK in between: run A (2 nodes)
        checkpoints per-node spill floors; run B resumes with 1 node
        (node 1 never runs again) and its checkpoints must CARRY node
        1's floor forward — without it, run C's prune sees no floor for
        node01_part files, treats finalized parts as stale and deletes
        crawl results the replay never re-produces (their URLs are
        already in the seen set). Final sets must equal a clean run."""
        import json
        import os

        import pyarrow.parquet as pq

        from linkinator_ray.pipelines import crawl as crawl_mod
        from linkinator_ray.sources.synth import synth_crawl_corpus
        docs, seeds, expected_seen, _ = synth_crawl_corpus(
            num_hosts=2, docs_per_host=400)
        base = dict(paths=seeds, recurse=True, mesh=True)
        full = LinkChecker(CheckOptions(**base, fetch_concurrency=2),
                           docs, [], multi_host=True, use_ray=True).check()

        ck = str(tmp_path / "meshck")
        res_dir = str(tmp_path / "meshres")
        orig = crawl_mod.LinkChecker._mesh_checkpoint

        def make_bomb(counter):
            def bomb(self, nodes, epoch, num_actors, seed_rows):
                orig(self, nodes, epoch, num_actors, seed_rows)
                counter["n"] += 1
                if counter["n"] >= 1:
                    raise KeyboardInterrupt
            return bomb

        def newest_manifest():
            rounds = sorted(d for d in os.listdir(ck)
                            if d.startswith("round_")
                            and not d.endswith(".tmp"))
            with open(os.path.join(ck, rounds[-1], "manifest.json")) as f:
                return json.load(f)

        # run A: 2 nodes, crash after the first epoch checkpoint
        run_a = LinkChecker(
            CheckOptions(**base, fetch_concurrency=2, checkpoint_dir=ck,
                         checkpoint_interval_s=0.2, batch_size=64,
                         results_dir=res_dir, results_flush_rows=50),
            docs, [], multi_host=True, use_ray=True,
            transport_latency_s=0.005)
        run_a._mesh_checkpoint = make_bomb({"n": 0}).__get__(run_a)
        try:
            run_a.check()
        except KeyboardInterrupt:
            pass
        floors_a = newest_manifest()["extra"]["node_spill_parts"]
        assert len(floors_a) == 2

        # run B: SHRINK to 1 node, crash after its first checkpoint
        run_b = LinkChecker(
            CheckOptions(**base, fetch_concurrency=1, checkpoint_dir=ck,
                         checkpoint_interval_s=0.2, batch_size=64,
                         results_dir=res_dir, results_flush_rows=50),
            docs, [], multi_host=True, use_ray=True,
            transport_latency_s=0.005)
        run_b._mesh_checkpoint = make_bomb({"n": 0}).__get__(run_b)
        try:
            run_b.check(resume_from=ck)
        except KeyboardInterrupt:
            pass
        floors_b = newest_manifest()["extra"]["node_spill_parts"]
        # the 1-node run's checkpoint still knows node 1's floor
        assert len(floors_b) == 2
        assert floors_b[1] == floors_a[1]
        assert floors_b[0] >= floors_a[0]

        # run C: resume again (1 node), run to completion
        run_c = LinkChecker(
            CheckOptions(**base, fetch_concurrency=1, checkpoint_dir=ck,
                         results_dir=res_dir, results_flush_rows=50),
            docs, [], multi_host=True, use_ray=True)
        final = run_c.check(resume_from=ck)

        parts = sorted(os.listdir(res_dir))
        tables = [pq.read_table(os.path.join(res_dir, p)) for p in parts]
        cols = ["url", "state", "status"]
        rows = [final.results.select(cols)] \
            + [t.select(cols) for t in tables]

        def key(table):
            return {(r["url"], r["state"], r["status"])
                    for r in table.to_pylist()}
        got = set().union(*(key(t) for t in rows))
        assert got == key(full.results)
        assert final.stats["seen_urls"] == expected_seen

    def test_check_does_not_mutate_caller_options(self):
        """check() must leave the caller's CheckOptions untouched (the
        tail flush used to zero results_flush_rows; markdown auto-detect
        used to stick) so the same object reruns identically."""
        import dataclasses as dc

        fixture = fx.repeated_broken_link()
        opts = CheckOptions(paths=fixture.seeds, **fixture.options)
        before = dc.asdict(
            dc.replace(opts, links_to_skip=[], fragments_to_skip=[]))
        r1 = LinkChecker(opts, fixture.documents, fixture.http_map).check()
        after = dc.asdict(
            dc.replace(opts, links_to_skip=[], fragments_to_skip=[]))
        assert after == before
        r2 = LinkChecker(opts, fixture.documents, fixture.http_map).check()

        def key(res):
            return {(r["url"], r["state"], r["status"], r["parent"])
                    for r in res.results.to_pylist()}
        assert key(r1) == key(r2)
        assert r1.passed == r2.passed

    def test_pipelined_resume_honors_retry_deadline(self, ray_session,
                                                    tmp_path):
        """A checkpoint snapshotted mid-retry-backoff carries the row's
        not_before deadline; the pipelined resume must park it (advance
        the clock to the deadline) instead of re-fetching immediately."""
        from linkinator_ray.state.clock import FakeClock

        fixture = fx.retry_fixture()
        ck = str(tmp_path / "retryck")
        partial = LinkChecker(
            CheckOptions(paths=fixture.seeds, checkpoint_dir=ck,
                         max_rounds=2, **fixture.options),
            fixture.documents, fixture.http_map, clock=FakeClock())
        part_res = partial.check()
        # the 429s were fetched and requeued with not_before = now + 3
        assert any(r["url"].startswith("http://slow.invalid/")
                   for r in part_res.results.to_pylist()) is False

        resumed_checker = LinkChecker(
            CheckOptions(paths=fixture.seeds, pipelined=True,
                         fetch_concurrency=1, **fixture.options),
            fixture.documents, fixture.http_map, clock=FakeClock(),
            use_ray=True)
        resumed = resumed_checker.check(resume_from=ck)
        states = {r["url"]: r["state"] for r in resumed.results.to_pylist()}
        assert states["http://slow.invalid/1"] == "OK"
        assert states["http://slow.invalid/3"] == "OK"
        assert resumed.passed
        # the deadline was honored: the resumed clock advanced past
        # checkpoint-time + Retry-After (3 s)
        assert resumed_checker.clock.now() >= 1_000_000.0 + 3

    def test_driver_resume_of_mesh_checkpoint(self, ray_session, tmp_path):
        """A mesh-written checkpoint resumed in driver rounds mode: the
        per-node seen dumps don't map onto the driver's shard layout, so
        membership rebuilds from the key journal — final sets must match
        a clean run."""
        import os

        from linkinator_ray.sources.synth import synth_crawl_corpus
        docs, seeds, expected_seen, _ = synth_crawl_corpus(
            num_hosts=2, docs_per_host=400)
        base = dict(paths=seeds, recurse=True, fetch_concurrency=2)
        full = LinkChecker(CheckOptions(**base), docs, [],
                           multi_host=True, use_ray=True).check()

        ck = str(tmp_path / "crossck")
        # 5 ms injected latency: without it a fast machine drains the
        # whole mesh before the first 0.2 s checkpoint epoch fires and
        # the bomb never goes off (results are latency-independent)
        partial = LinkChecker(
            CheckOptions(**base, mesh=True, checkpoint_dir=ck,
                         checkpoint_interval_s=0.2, batch_size=64),
            docs, [], multi_host=True, use_ray=True,
            transport_latency_s=0.005)
        orig = partial._mesh_checkpoint
        calls = {"n": 0}

        def bomb(nodes, epoch, num_actors, seed_rows):
            orig(nodes, epoch, num_actors, seed_rows)
            calls["n"] += 1
            if calls["n"] >= 1:
                raise KeyboardInterrupt
        partial._mesh_checkpoint = bomb
        try:
            partial.check()
        except KeyboardInterrupt:
            pass
        assert os.path.isdir(ck) and os.listdir(ck), "no mesh checkpoint"

        # resume WITHOUT mesh: driver rounds mode over the mesh epoch
        resumed = LinkChecker(CheckOptions(**base), docs, [],
                              multi_host=True, use_ray=True).check(
            resume_from=ck)

        def key(res):
            return {(r["url"], r["state"], r["status"])
                    for r in res.results.to_pylist()}
        assert key(resumed) == key(full)
        assert resumed.stats["seen_urls"] == expected_seen
