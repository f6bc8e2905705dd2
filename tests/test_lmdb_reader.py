"""Pure-python LMDB reader tests.

No lmdb C library exists in this environment, so the fixtures are written
by a minimal spec-faithful writer below that emits the exact LMDB 0.9
on-disk layout (64-bit): dual meta pages, branch/leaf B-tree pages with
the node ptr array, and F_BIGDATA overflow chains — the same structures
documented in nshmc_tpu/utils/lmdb_reader.py. Covers: single-leaf DBs,
multi-level trees, big-value overflow, stale-meta selection, and the LSUN
dataset end-to-end with webp-encoded images.
"""
import io
import os
import struct

import numpy as np
import pytest

from nshmc_tpu.utils.lmdb_reader import (
    LMDBReader, LMDBError, MDB_MAGIC, P_BRANCH, P_LEAF, P_OVERFLOW, P_META,
    F_BIGDATA, P_INVALID,
)

PSIZE = 4096
PAGE_HDR = struct.Struct("<QHHHH")
NODE = struct.Struct("<HHHH")


def _page(pgno, flags, body=b"", lower=None, upper=None, pages=None):
    """Build one page. For overflow pages `pages` goes into the pb union
    (lower|upper reinterpreted as a u32 page count in mdb.c)."""
    if pages is not None:
        pb = struct.pack("<I", pages)
        hdr = struct.pack("<QHH", pgno, 0, flags) + pb
    else:
        hdr = struct.pack("<QHHHH", pgno, 0, flags,
                          lower if lower is not None else PAGE_HDR.size,
                          upper if upper is not None else PSIZE)
    page = hdr + body
    assert len(page) <= PSIZE
    return page + b"\0" * (PSIZE - len(page))


def _node_page(pgno, flags, nodes):
    """Pack nodes (bytes blobs) bottom-up with a ptr array, LMDB layout."""
    ptrs = []
    tail = PSIZE
    blob = bytearray(PSIZE)
    for nd in nodes:
        tail -= len(nd)
        # LMDB 2-byte aligns nodes
        tail -= tail % 2
        blob[tail: tail + len(nd)] = nd
        ptrs.append(tail)
    lower = PAGE_HDR.size + 2 * len(nodes)
    hdr = struct.pack("<QHHHH", pgno, 0, flags, lower, tail)
    blob[: len(hdr)] = hdr
    off = PAGE_HDR.size
    for p in ptrs:
        struct.pack_into("<H", blob, off, p)
        off += 2
    return bytes(blob)


def _leaf_node(key, data=None, bigdata_pgno=None):
    if bigdata_pgno is not None:
        dsize = data  # caller passes total size
        return (NODE.pack(dsize & 0xFFFF, (dsize >> 16) & 0xFFFF,
                          F_BIGDATA, len(key))
                + key + struct.pack("<Q", bigdata_pgno))
    dsize = len(data)
    return (NODE.pack(dsize & 0xFFFF, (dsize >> 16) & 0xFFFF, 0, len(key))
            + key + data)


def _branch_node(key, child_pgno):
    return (NODE.pack(child_pgno & 0xFFFF, (child_pgno >> 16) & 0xFFFF,
                      (child_pgno >> 32) & 0xFFFF, len(key)) + key)


def _meta_page(pgno, root, entries, depth, txnid, last_pg):
    body = struct.pack("<IIQQ", MDB_MAGIC, 1, 0, PSIZE * 64)
    # dbs[0] (free db): md_pad carries the page size
    body += struct.pack("<IHHQQQQQ", PSIZE, 0, 0, 0, 0, 0, 0, P_INVALID)
    # dbs[1] (main db)
    body += struct.pack("<IHHQQQQQ", 0, 0, depth, 0, 1, 0, entries, root)
    body += struct.pack("<QQ", last_pg, txnid)
    return _page(pgno, P_META, body)


def _write_env(tmp_path, pages, root, entries, depth, name="env"):
    d = tmp_path / name
    d.mkdir()
    metas = [_meta_page(0, root, entries, depth, txnid=1, last_pg=len(pages) + 1),
             _meta_page(1, P_INVALID, 0, 0, txnid=0, last_pg=1)]
    with open(d / "data.mdb", "wb") as f:
        for p in metas + pages:
            f.write(p)
    return str(d)


def test_single_leaf(tmp_path):
    kv = {b"a": b"alpha", b"bb": b"beta" * 10, b"ccc": b""}
    nodes = [_leaf_node(k, v) for k, v in sorted(kv.items())]
    leaf = _node_page(2, P_LEAF, nodes)
    env = _write_env(tmp_path, [leaf], root=2, entries=len(kv), depth=1)
    with LMDBReader(env) as r:
        assert len(r) == 3
        assert dict(r.items()) == kv
        assert r.get(b"bb") == b"beta" * 10
        assert r.get(b"zz") is None


def test_two_level_tree(tmp_path):
    left = {f"k{i:02d}".encode(): f"v{i}".encode() * 3 for i in range(5)}
    right = {f"k{i:02d}".encode(): f"v{i}".encode() * 3 for i in range(5, 9)}
    leaf_l = _node_page(3, P_LEAF, [_leaf_node(k, v)
                                    for k, v in sorted(left.items())])
    leaf_r = _node_page(4, P_LEAF, [_leaf_node(k, v)
                                    for k, v in sorted(right.items())])
    branch = _node_page(2, P_BRANCH, [
        _branch_node(b"", 3),          # first branch key is empty in LMDB
        _branch_node(b"k05", 4),
    ])
    env = _write_env(tmp_path, [branch, leaf_l, leaf_r], root=2,
                     entries=9, depth=2)
    with LMDBReader(env) as r:
        got = dict(r.items())
        assert got == {**left, **right}
        assert list(got) == sorted(got)  # key order preserved


def test_overflow_value(tmp_path):
    big = bytes(range(256)) * 40  # 10240 B -> 3 overflow pages
    n_ov = -(-(len(big) + PAGE_HDR.size) // PSIZE)
    leaf = _node_page(2, P_LEAF,
                      [_leaf_node(b"big", len(big), bigdata_pgno=3),
                       _leaf_node(b"small", b"x")])
    # overflow chain: 16-byte header (pb union = u32 page count), then the
    # value contiguous across n_ov pages
    ov_hdr = struct.pack("<QHH", 3, 0, P_OVERFLOW) + struct.pack("<I", n_ov)
    ov_full = ov_hdr + big
    ov_full += b"\0" * (n_ov * PSIZE - len(ov_full))
    env_pages = [leaf, ov_full[:PSIZE], ov_full[PSIZE:2 * PSIZE],
                 ov_full[2 * PSIZE:]]
    env = _write_env(tmp_path, env_pages, root=2, entries=2, depth=1)
    with LMDBReader(env) as r:
        assert r.get(b"big") == big
        assert r.get(b"small") == b"x"


def test_meta_selection_newer_txn(tmp_path):
    """Reader must pick the meta page with the larger txnid."""
    kv = {b"k": b"new"}
    leaf = _node_page(2, P_LEAF, [_leaf_node(b"k", b"new")])
    d = tmp_path / "env2"
    d.mkdir()
    # meta0 stale (txnid 0, empty root), meta1 live (txnid 5, root=2)
    m0 = _meta_page(0, P_INVALID, 0, 0, txnid=0, last_pg=1)
    m1 = _meta_page(1, 2, 1, 1, txnid=5, last_pg=3)
    with open(d / "data.mdb", "wb") as f:
        f.write(m0 + m1 + leaf)
    with LMDBReader(str(d)) as r:
        assert dict(r.items()) == kv


def test_bad_magic_raises(tmp_path):
    d = tmp_path / "bad"
    d.mkdir()
    with open(d / "data.mdb", "wb") as f:
        f.write(b"\0" * 8192)
    with pytest.raises(LMDBError):
        LMDBReader(str(d))


def test_lsun_dataset_end_to_end(tmp_path):
    """LSUN dataset over a crafted lmdb of webp images -> [0,1] NHWC."""
    from PIL import Image
    from nshmc_tpu.utils.datasets import get_dataset

    from nshmc_tpu.utils.datasets import _center_crop_long_edge

    rng = np.random.default_rng(0)
    imgs = {}
    nodes = []
    for i in range(3):
        # small smooth gradient images keep the lossless webp tiny enough
        # for all three to share one 4 KB leaf page
        g = (np.arange(24)[:, None] * 8 + np.arange(16)[None] + i * 7) % 256
        arr = np.stack([g, g // 2, 255 - g], axis=-1).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="WEBP", lossless=True)
        key = f"img{i}".encode()
        imgs[key] = arr
        nodes.append(_leaf_node(key, buf.getvalue()))
    leaf = _node_page(2, P_LEAF, nodes)
    env = _write_env(tmp_path, [leaf], root=2, entries=3, depth=1)

    ds = get_dataset("lsun", env, image_size=16)
    assert len(ds) == 3
    for i in range(3):
        out = ds[i]
        assert out.shape == (16, 16, 3)
        assert out.dtype == np.float32
        assert 0.0 <= out.min() and out.max() <= 1.0
    key = sorted(imgs)[0]
    ref = _center_crop_long_edge(Image.fromarray(imgs[key])).resize((16, 16))
    np.testing.assert_allclose(
        ds[0], np.asarray(ref, np.float32) / 255.0, atol=1e-6)
