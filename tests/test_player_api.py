"""The reference's system test, replayed against the Spark engine.

Mirrors ``PlayerResourceIT.crud()`` (IT:109-190) assertion-for-
assertion: create -> read-your-write, update -> last-write-wins,
findAll membership, idempotent delete of an absent id, tombstone
removal — plus the fix for the reference's own assertion bug (IT:188
re-checks the wrong response; here the post-delete read is real).
"""

from __future__ import annotations

from pokertracker_cassandra_st_spark.player_api import PlayerStore


def test_crud_lifecycle(spark, tmp_path):
    store = PlayerStore(spark, str(tmp_path))

    # create (IT:123-127): server assigns a monotonic id
    pid = store.create("Robert", "Brem")
    assert pid == 1
    pid2 = store.create("Other", "Person")
    assert pid2 == 2

    # read-your-write (IT:131-139): fields present with created values
    p = store.get(pid)
    assert p is not None
    assert p.firstName == "Robert" and p.lastName == "Brem"

    # update (IT:148-161): subsequent read sees the new values
    store.update(pid, "Robertupdated", "Bremupdated")
    p = store.get(pid)
    assert p.firstName == "Robertupdated" and p.lastName == "Bremupdated"

    # findAll (IT:164-171): non-empty, contains the updated entity
    all_players = store.find_all()
    assert len(all_players) == 2
    assert any(r.id == pid and r.firstName == "Robertupdated" for r in all_players)

    # idempotent delete of a non-existent id (IT:174-179: id -42 -> 204)
    store.delete(-42)
    assert store.get(-42) is None
    assert len(store.find_all()) == 2  # nothing else changed

    # delete the created player (IT:182-188): gone from both reads
    store.delete(pid)
    assert store.get(pid) is None
    assert [r.id for r in store.find_all()] == [pid2]


def test_versions_order_not_wall_clock(spark, tmp_path):
    # last-write-wins is by VERSION (the clustering key, initial_db
    # .sql:11), not timestamps — two updates in the same instant still
    # resolve deterministically.
    store = PlayerStore(spark, str(tmp_path))
    pid = store.create("A", "A")
    for i in range(5):
        store.update(pid, f"v{i}", "x")
    assert store.get(pid).firstName == "v4"
