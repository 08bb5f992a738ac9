"""Round-5p tests: SnapshotDeletionPolicy — pinning vs tiered merge,
release, rollback (manifest-first ordering), persistence across policy
instances, and error contracts. Reference semantics:
Index/SnapshotDeletionPolicy.cs (Snapshot/Release/GetSnapshots),
PersistentSnapshotDeletionPolicy.cs (durable snapshot store)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.search.queries import TermQuery
from lucenenet_spark.streaming.incremental import (
    IncrementalIndexer,
    SnapshotDeletionPolicy,
)

DOCS = [
    (0, "spark merge query engine"),
    (1, "vector index scan table"),
    (2, "merge policy segment flush"),
    (3, "query parser boolean clause"),
    (4, "vector spark merge table"),
    (5, "segment merge vector query"),
]


def _batch(spark, ids):
    return spark.createDataFrame(
        [d for d in DOCS if d[0] in ids], ["doc_id", "text"]
    )


@pytest.fixture()
def indexer(spark, tmp_path):
    ix = IncrementalIndexer(str(tmp_path / "idx"))
    return ix


def test_snapshot_requires_a_commit(indexer):
    policy = SnapshotDeletionPolicy(indexer)
    with pytest.raises(ValueError):
        policy.snapshot()


def test_snapshot_pins_segments_against_merge(spark, indexer):
    policy = SnapshotDeletionPolicy(indexer)
    indexer.process_batch(_batch(spark, {0, 1}), 0)
    sid = policy.snapshot()
    indexer.process_batch(_batch(spark, {2, 3}), 1)
    indexer.process_batch(_batch(spark, {4, 5}), 2)
    seg_root = os.path.join(indexer.out_dir, "segments")
    # seg 0 is pinned; segs 1+2 are mergeable -> merge runs but must not
    # touch the pinned dir.
    assert indexer.maybe_merge(spark, max_segments=1, merge_factor=3)
    assert os.path.isdir(os.path.join(seg_root, "seg_00000000"))
    assert not os.path.isdir(os.path.join(seg_root, "seg_00000001"))
    # the pinned commit point stays openable (the reference guarantee)
    assert policy.get_snapshot(sid) == ("seg_00000000",)
    pinned = indexer.acquire(spark, policy.get_snapshot(sid))
    assert pinned.index.max_doc == 2


def test_merge_refuses_when_fewer_than_two_victims(spark, indexer):
    policy = SnapshotDeletionPolicy(indexer)
    indexer.process_batch(_batch(spark, {0, 1}), 0)
    policy.snapshot()
    indexer.process_batch(_batch(spark, {2, 3}), 1)
    # 2 committed > max_segments=1, but only seg 1 is unpinned: no merge.
    assert not indexer.maybe_merge(spark, max_segments=1, merge_factor=2)
    seg_root = os.path.join(indexer.out_dir, "segments")
    assert os.path.isdir(os.path.join(seg_root, "seg_00000001"))


def test_release_makes_segments_mergeable_again(spark, indexer):
    policy = SnapshotDeletionPolicy(indexer)
    indexer.process_batch(_batch(spark, {0, 1}), 0)
    sid = policy.snapshot()
    indexer.process_batch(_batch(spark, {2, 3}), 1)
    assert not indexer.maybe_merge(spark, max_segments=1, merge_factor=2)
    policy.release(sid)
    assert indexer.maybe_merge(spark, max_segments=1, merge_factor=2)
    with pytest.raises(KeyError):
        policy.get_snapshot(sid)


def test_rollback_restores_the_commit_point(spark, indexer):
    policy = SnapshotDeletionPolicy(indexer)
    indexer.process_batch(_batch(spark, {0, 1, 2}), 0)
    sid = policy.snapshot()
    indexer.process_batch(_batch(spark, {3, 4, 5}), 1)
    assert indexer.refresh(spark).index.max_doc == 6
    policy.rollback(sid)
    s = indexer.refresh(spark)
    assert s.index.max_doc == 3
    # the dropped segment's dir is reclaimed and its docs unfindable
    seg_root = os.path.join(indexer.out_dir, "segments")
    assert not os.path.isdir(os.path.join(seg_root, "seg_00000001"))
    hits = {r["doc_id"] for r in s.docset(TermQuery("vector")).collect()}
    assert hits == {1}  # doc 4/5 contain 'vector' but were rolled back


def test_rollback_releases_newer_snapshots_keeps_older(spark, indexer):
    policy = SnapshotDeletionPolicy(indexer)
    indexer.process_batch(_batch(spark, {0, 1}), 0)
    sid0 = policy.snapshot()
    indexer.process_batch(_batch(spark, {2, 3}), 1)
    sid1 = policy.snapshot()
    indexer.process_batch(_batch(spark, {4, 5}), 2)
    sid2 = policy.snapshot()
    policy.rollback(sid1)
    # sid2 named seg 2 which no longer exists -> auto-released;
    # sid0's set is a subset of the restored commit -> still live.
    with pytest.raises(KeyError):
        policy.get_snapshot(sid2)
    assert policy.get_snapshot(sid0) == ("seg_00000000",)
    assert set(policy.get_snapshot(sid1)) == {"seg_00000000", "seg_00000001"}


def test_snapshots_persist_across_policy_instances(spark, indexer):
    policy = SnapshotDeletionPolicy(indexer)
    indexer.process_batch(_batch(spark, {0, 1}), 0)
    sid = policy.snapshot()
    # a fresh policy (new process in the reference's Persistent variant)
    # sees the pin and still protects the segment
    policy2 = SnapshotDeletionPolicy(indexer)
    assert policy2.get_snapshot(sid) == ("seg_00000000",)
    assert "seg_00000000" in policy2.protected_keys()


def test_rollback_unknown_snapshot_raises(spark, indexer):
    policy = SnapshotDeletionPolicy(indexer)
    indexer.process_batch(_batch(spark, {0, 1}), 0)
    with pytest.raises(KeyError):
        policy.rollback("snap_99999999")


# ----------------------------------------------------------- replicator
from lucenenet_spark.index.replicator import (  # noqa: E402
    LocalReplicator,
    ReplicationClient,
)


@pytest.fixture()
def replication(spark, tmp_path):
    master = IncrementalIndexer(str(tmp_path / "master"))
    replicator = LocalReplicator(master)
    client = ReplicationClient(replicator, str(tmp_path / "replica"))
    return master, replicator, client


def test_update_before_publish_raises(replication):
    _, _, client = replication
    with pytest.raises(ValueError):
        client.update_now()


def test_publish_and_sync_serves_same_results(spark, replication):
    master, replicator, client = replication
    master.process_batch(_batch(spark, {0, 1, 2}), 0)
    replicator.publish()
    assert client.update_now()
    s = client.indexer().refresh(spark)
    assert s.index.max_doc == 3
    hits = {r["doc_id"] for r in s.docset(TermQuery("merge")).collect()}
    master_hits = {
        r["doc_id"]
        for r in master.refresh(spark).docset(TermQuery("merge")).collect()
    }
    assert hits == master_hits == {0, 2}


def test_incremental_sync_copies_only_new_segments(spark, replication):
    master, replicator, client = replication
    master.process_batch(_batch(spark, {0, 1}), 0)
    replicator.publish()
    client.update_now()
    seg0 = os.path.join(client.replica_dir, "segments", "seg_00000000")
    mtime0 = os.path.getmtime(seg0)
    master.process_batch(_batch(spark, {2, 3}), 1)
    replicator.publish()
    assert client.update_now()
    # the already-replicated immutable segment was NOT re-copied
    assert os.path.getmtime(seg0) == mtime0
    assert client.indexer().refresh(spark).index.max_doc == 4


def test_sync_is_idempotent_when_current(spark, replication):
    master, replicator, client = replication
    master.process_batch(_batch(spark, {0, 1}), 0)
    replicator.publish()
    assert client.update_now()
    assert not client.update_now()


def test_publish_releases_previous_revision(spark, replication):
    master, replicator, client = replication
    master.process_batch(_batch(spark, {0, 1}), 0)
    r1 = replicator.publish()
    master.process_batch(_batch(spark, {2, 3}), 1)
    r2 = replicator.publish()
    # r1's pin is gone, r2's pin protects both its segments
    with pytest.raises(KeyError):
        replicator.policy.get_snapshot(r1.id)
    assert set(replicator.policy.get_snapshot(r2.id)) == set(r2.keys)


def test_checksum_mismatch_raises(spark, replication):
    master, replicator, client = replication
    master.process_batch(_batch(spark, {0, 1}), 0)
    rev = replicator.publish()
    rel = next(iter(rev.files))
    size, _ = rev.files[rel]
    rev.files[rel] = (size, "0" * 32)  # corrupt the manifest digest
    with pytest.raises(ValueError):
        client.update_now()


def test_replica_cleans_up_rolled_back_segments(spark, replication):
    master, replicator, client = replication
    master.process_batch(_batch(spark, {0, 1}), 0)
    replicator.publish()
    # a user-held pin independent of the publish lifecycle (publish
    # releases ITS previous revision when superseded; a backup keeps
    # its own snapshot, the reference's documented pattern)
    backup = replicator.policy.snapshot()
    master.process_batch(_batch(spark, {2, 3}), 1)
    replicator.publish()
    client.update_now()
    assert client.indexer().refresh(spark).index.max_doc == 4
    # master rolls back to the backed-up commit point, re-publishes; the
    # replica's next sync drops the obsolete segment dir
    replicator.policy.rollback(backup)
    replicator.publish()
    assert client.update_now()
    assert client.indexer().refresh(spark).index.max_doc == 2
    assert not os.path.isdir(
        os.path.join(client.replica_dir, "segments", "seg_00000001")
    )


def test_scripted_publish_rollback_sync_invariant(spark, replication):
    """Metamorphic sequence test over a scripted interleaving that is
    GUARANTEED to execute every op kind — including rollback between a
    publish and a sync (the case where the published revision is
    invalidated and the client must see the documented ValueError, not
    a crash) — then converge: a replica that just synced serves exactly
    the master's published commit point."""
    master, replicator, client = replication
    next_batch = 0
    pins: list[str] = []

    def commit_batch():
        nonlocal next_batch
        ids = {(next_batch * 2) % 6, (next_batch * 2 + 1) % 6}
        master.process_batch(_batch(spark, ids), next_batch)
        next_batch += 1

    script = ["batch", "pin", "batch", "publish", "sync", "rollback",
              "sync", "publish", "sync", "batch", "pin", "batch",
              "publish", "rollback", "sync", "publish", "sync"]
    for op in script:
        if op == "batch":
            commit_batch()
        elif op == "pin":
            pins.append(replicator.policy.snapshot())
        elif op == "rollback":
            replicator.policy.rollback(pins[-1])
        elif op == "publish":
            replicator.publish()
        elif op == "sync":
            if replicator.current_revision() is None:
                # rollback invalidated the published revision: the
                # client reports it instead of copying deleted files
                with pytest.raises(ValueError):
                    client.update_now()
            else:
                client.update_now()
    # final convergence: publish + sync, then replica == published master
    rev = replicator.publish()
    client.update_now()
    s_replica = client.indexer().refresh(spark)
    s_master = master.acquire(spark, rev.keys)
    assert s_replica.index.max_doc == s_master.index.max_doc
    for term in ("merge", "vector", "query"):
        hr = {r["doc_id"] for r in s_replica.docset(TermQuery(term)).collect()}
        hm = {r["doc_id"] for r in s_master.docset(TermQuery(term)).collect()}
        assert hr == hm, term


def test_replica_detects_recreated_segment_key(spark, replication):
    """A rollback + batch-id replay can recreate a segment KEY with
    different content; the replica must detect the uid mismatch and
    re-copy instead of serving stale postings under fresh metadata."""
    master, replicator, client = replication
    master.process_batch(_batch(spark, {0, 1}), 0)
    backup = replicator.policy.snapshot()
    master.process_batch(_batch(spark, {2, 3}), 1)  # seg_00000001 v1
    replicator.publish()
    client.update_now()
    replicator.policy.rollback(backup)
    master.process_batch(_batch(spark, {4, 5}), 1)  # seg_00000001 v2!
    replicator.publish()
    assert client.update_now()
    s = client.indexer().refresh(spark)
    hits = {r["doc_id"] for r in s.docset(TermQuery("vector")).collect()}
    assert hits == {1, 4, 5}  # v2 content (docs 4/5), not stale v1 (doc 1 only from batch 0)


def test_merge_protection_survives_process_restart(spark, tmp_path):
    """Pins are durable: a writer opened WITHOUT a policy instance (a
    fresh process) still refuses to merge snapshotted segments, because
    maybe_merge reads snapshots.json directly."""
    out = str(tmp_path / "idx")
    ix1 = IncrementalIndexer(out)
    policy = SnapshotDeletionPolicy(ix1)
    ix1.process_batch(_batch(spark, {0, 1}), 0)
    policy.snapshot()
    ix1.process_batch(_batch(spark, {2, 3}), 1)
    # "restart": a brand-new indexer object, no policy constructed
    ix2 = IncrementalIndexer(out)
    assert not ix2.maybe_merge(spark, max_segments=1, merge_factor=2)
    assert os.path.isdir(os.path.join(out, "segments", "seg_00000000"))
