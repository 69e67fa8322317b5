"""Rendezvous shard assignment (frontier/shards.py): the HRW minimal-
disruption properties — shard loss moves only its keys (each to its
recorded backup), shard join moves keys only TO the joiner — plus salt
independence and the single-shard edge."""

import pytest

from cord19_crawler_spark.frontier.shards import rendezvous_shards

HOSTS = [f"h{i}.example.com" for i in range(200)]


def _assign(spark, shard_ids, salt=""):
    df = spark.createDataFrame([(h,) for h in HOSTS], "host string")
    return {
        r["host"]: (r["shard"], r["backup"])
        for r in rendezvous_shards(df, "host", shard_ids, salt).collect()
    }


def test_shard_loss_moves_only_its_keys_to_backup(spark):
    full = _assign(spark, 8)
    dead = 3
    without = _assign(spark, [s for s in range(8) if s != dead])
    moved = 0
    for h in HOSTS:
        shard, backup = full[h]
        if shard != dead:
            assert without[h][0] == shard, h  # survivors don't move
        else:
            moved += 1
            assert without[h][0] == backup, h  # failover = recorded backup
    assert 0 < moved < len(HOSTS) / 4  # ~1/8 expected


def test_shard_join_moves_keys_only_to_joiner(spark):
    small = _assign(spark, 8)
    grown = _assign(spark, 9)
    for h in HOSTS:
        if grown[h][0] != small[h][0]:
            assert grown[h][0] == 8, h


def test_balance_and_determinism(spark):
    a = _assign(spark, 16)
    b = _assign(spark, 16)
    assert a == b
    counts = {}
    for shard, _ in a.values():
        counts[shard] = counts.get(shard, 0) + 1
    # every shard used; no shard dominates (200 keys / 16 shards)
    assert len(counts) == 16
    assert max(counts.values()) <= 4 * (200 / 16)


def test_salt_and_edges(spark):
    assert _assign(spark, 8, salt="/v2") != _assign(spark, 8)
    single = _assign(spark, [5])
    assert all(v == (5, None) for v in single.values())
    with pytest.raises(ValueError):
        rendezvous_shards(
            spark.createDataFrame([("h",)], "host string"), "host", []
        )
