"""KV-store entry point: the real `lmdb` binding when importable, else the
pure-Python LMDB codec (fabind_tpu.data.mdb).

Both expose the `lmdb.open(...)` subset the framework uses: begin() txns
with get/put/cursor. The reference hard-requires the C binding
(FABind/fabind/data.py:6); here it is optional so the real-data path works
on hosts without liblmdb.
"""
from __future__ import annotations


def have_lmdb() -> bool:
    try:
        import lmdb  # noqa: F401
        return True
    except ImportError:
        return False


def open_kv(path: str, readonly: bool = True, **kw):
    """Open an LMDB environment (directory containing data.mdb)."""
    try:
        import lmdb
        return lmdb.open(path, readonly=readonly, **kw)
    except ImportError:
        from fabind_tpu.data import mdb
        return mdb.open(path, readonly=readonly, **kw)


def write_kv(path: str, items) -> None:
    """Put `items` (dict[bytes, bytes]) into the environment at `path`,
    creating it if needed. Both backends MERGE into existing contents
    (lmdb txn.put semantics); the pure-Python fallback reads any existing
    entries before rebuilding the file."""
    try:
        import lmdb
        env = lmdb.open(path, map_size=1 << 34)
        with env.begin(write=True) as txn:
            for k, v in items.items():
                txn.put(k, v)
        env.sync()
        env.close()
    except ImportError:
        from fabind_tpu.data import mdb
        env = mdb.Env(path, readonly=False)
        with env.begin(write=True) as txn:
            for k, v in items.items():
                txn.put(k, v)
        env.close()
