"""Pure-Python LMDB codec roundtrip + structural checks.

When the real `lmdb` binding is importable the tests additionally cross-read
each file with it (interop proof); in lmdb-less environments the pure
reader/writer pair is self-checked plus verified against hand-decoded
structs.

Known coverage limit: the reverse interop direction (this reader parsing a
file WRITTEN by real liblmdb) cannot be exercised here — neither the
binding nor liblmdb/mdb_dump exists in this image to produce such a file,
and committing one produced elsewhere would be an unverifiable blob. The
struct layouts were checked against liblmdb 0.9's mdb.c conventions
(PAGEHDRSZ=16, meta psize in FREE.md_pad, branch NODEPGNO lo/hi/flags
packing, F_BIGDATA overflow chains); environments WITH the binding never
take the pure-Python path at all (kv.open_kv prefers the C reader).
"""
import os
import pickle
import struct

import numpy as np
import pytest

from fabind_tpu.data import mdb
from fabind_tpu.data.kv import have_lmdb, open_kv, write_kv


def roundtrip(tmp_path, items, name="env.lmdb"):
    path = str(tmp_path / name)
    mdb.write_env(path, items)
    env = mdb.open(path)
    with env.begin() as txn:
        for k, v in items.items():
            assert txn.get(k) == v, k
        assert txn.get(b"\x00missing") is None
        got = dict(txn.cursor())
    assert got == items
    if have_lmdb():
        import lmdb
        renv = lmdb.open(path, readonly=True, lock=False)
        with renv.begin() as txn:
            for k, v in items.items():
                assert bytes(txn.get(k)) == v
    return path


def test_small_values_single_leaf(tmp_path):
    items = {f"k{i:03d}".encode(): f"value-{i}".encode() for i in range(10)}
    path = roundtrip(tmp_path, items)
    raw = open(os.path.join(path, "data.mdb"), "rb").read()
    # meta sanity: magic, version, psize in FREE.md_pad, entries in MAIN db
    magic, version = struct.unpack_from("<II", raw, 16)
    assert magic == 0xBEEFC0DE and version == 1
    psize = struct.unpack_from("<I", raw, 16 + 24)[0]
    assert psize == 4096
    entries = struct.unpack_from("<Q", raw, 16 + 24 + 48 + 32)[0]
    assert entries == 10
    # single-leaf db: depth 1
    depth = struct.unpack_from("<H", raw, 16 + 24 + 48 + 6)[0]
    assert depth == 1


def test_overflow_values(tmp_path):
    rng = np.random.RandomState(0)
    items = {f"big{i}".encode(): rng.bytes(50_000 + i * 7919)
             for i in range(5)}
    items[b"tiny"] = b"x"
    roundtrip(tmp_path, items)


def test_multi_page_btree(tmp_path):
    # enough keys to force multiple leaves and branch levels
    items = {f"key-{i:05d}".encode():
             (f"payload-{i}" * (1 + i % 13)).encode()
             for i in range(3000)}
    path = roundtrip(tmp_path, items)
    raw = open(os.path.join(path, "data.mdb"), "rb").read()
    depth = struct.unpack_from("<H", raw, 16 + 24 + 48 + 6)[0]
    assert depth >= 2
    # point lookups through the branch path, not just full iteration
    env = mdb.open(path)
    with env.begin() as txn:
        assert txn.get(b"key-02997") == items[b"key-02997"]
        assert txn.get(b"key-00000") == items[b"key-00000"]
        assert txn.get(b"key-02999") == items[b"key-02999"]
        assert txn.get(b"key-03000") is None


def test_empty_env(tmp_path):
    path = str(tmp_path / "empty.lmdb")
    mdb.write_env(path, {})
    env = mdb.open(path)
    with env.begin() as txn:
        assert txn.get(b"k") is None
        assert list(txn.cursor()) == []
    assert env.stat()["entries"] == 0


def test_writer_api_and_reopen(tmp_path):
    path = str(tmp_path / "w.lmdb")
    env = open_kv(path, readonly=False, map_size=1 << 24)
    with env.begin(write=True) as txn:
        txn.put(b"a", pickle.dumps((np.arange(4), "seq")))
        txn.put(b"b", b"two")
    env.close()
    env2 = open_kv(path, readonly=True)
    with env2.begin() as txn:
        arr, seq = pickle.loads(txn.get(b"a"))
        np.testing.assert_array_equal(arr, np.arange(4))
        assert txn.get(b"b") == b"two"


def test_incremental_update_preserves_existing(tmp_path):
    path = str(tmp_path / "u.lmdb")
    write_kv(path, {b"a": b"1", b"b": b"2"})
    env = open_kv(path, readonly=False)
    with env.begin(write=True) as txn:
        assert txn.get(b"a") == b"1"
        txn.put(b"c", b"3")
        txn.put(b"a", b"updated")
    env.close()
    env2 = open_kv(path)
    with env2.begin() as txn:
        assert dict(txn.cursor()) == {b"a": b"updated", b"b": b"2",
                                      b"c": b"3"}


def test_file_style_env_writes_back_to_same_file(tmp_path):
    """subdir=False style: opening a bare data file read-write must commit
    to THAT file, not dirname/data.mdb (round-2 review finding)."""
    d = tmp_path / "env.lmdb"
    mdb.write_env(str(d), {b"a": b"1"})
    fpath = str(d / "data.mdb")
    env = mdb.open(fpath, readonly=False)   # file, not directory
    with env.begin(write=True) as txn:
        txn.put(b"b", b"2")
    env.close()
    env2 = mdb.open(fpath)
    with env2.begin() as txn:
        assert dict(txn.cursor()) == {b"a": b"1", b"b": b"2"}


def test_write_kv_merges_like_lmdb(tmp_path):
    """write_kv must merge into existing contents with BOTH backends
    (real lmdb txn.put merges; the fallback must too)."""
    path = str(tmp_path / "m.lmdb")
    write_kv(path, {b"a": b"1", b"b": b"2"})
    write_kv(path, {b"b": b"new", b"c": b"3"})
    env = open_kv(path)
    with env.begin() as txn:
        assert dict(txn.cursor()) == {b"a": b"1", b"b": b"new", b"c": b"3"}


def test_readonly_rejects_writes(tmp_path):
    path = str(tmp_path / "ro.lmdb")
    write_kv(path, {b"a": b"1"})
    env = mdb.open(path, readonly=True)
    with pytest.raises(PermissionError):
        env.begin(write=True)


def test_missing_env_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        mdb.open(str(tmp_path / "nope.lmdb"))


def test_fuzz_roundtrip_random_sizes(tmp_path):
    """Randomized round-trip: binary keys, value sizes spanning the inline/
    overflow boundary (NODEMAX=2040) and page-multiple edges, plus empty
    values and near-limit keys."""
    rng = np.random.RandomState(1234)
    items = {}
    # sizes hugging every structural boundary
    edge_sizes = [0, 1, mdb.NODEMAX - 20, mdb.NODEMAX - 8, mdb.NODEMAX,
                  mdb.NODEMAX + 1, mdb.PAGESIZE - mdb.PAGEHDRSZ,
                  mdb.PAGESIZE - mdb.PAGEHDRSZ + 1, mdb.PAGESIZE,
                  2 * mdb.PAGESIZE, 2 * mdb.PAGESIZE + 1]
    for i, sz in enumerate(edge_sizes):
        items[b"edge\x00" + bytes([i])] = rng.bytes(sz)
    # random binary keys/values
    for _ in range(400):
        klen = int(rng.randint(1, 64))
        items[rng.bytes(klen)] = rng.bytes(int(rng.randint(0, 6000)))
    # a key at the 511-byte limit
    items[b"L" * 511] = b"limit"
    roundtrip(tmp_path, items, name="fuzz.lmdb")
    with pytest.raises(ValueError):
        mdb.write_env(str(tmp_path / "badkey.lmdb"), {b"K" * 512: b"x"})
