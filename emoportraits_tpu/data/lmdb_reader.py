"""Minimal dependency-free LMDB (liblmdb 0.9.x data format) reader + fixture writer.

The reference stores VoxCeleb2HQ/FEED/MEAD as 128 LMDB environments
(`{root}/{i}_lmdb`, datasets/voxceleb2hq_pairs.py:52-54) read through py-lmdb. That
package isn't available here, and the converter (data/convert.py) only needs read-only
full iteration + point lookups — a small, well-specified slice of the on-disk format
(http://www.lmdb.tech/doc; struct layouts from mdb.c):

  * pages 0 and 1 are meta pages: 16-byte page header, then MDB_meta
    {magic 0xBEEFC0DE u32, version=1 u32, address u64, mapsize u64,
     MDB_db dbs[2], last_pg u64, txnid u64}; the page size lives in
     dbs[0].md_pad (the `mm_psize` alias in mdb.c) and the live meta is the one
     with the larger txnid;
  * MDB_db = {pad u32, flags u16, depth u16, branch/leaf/overflow pages u64 x3,
    entries u64, root u64}; the main key space is dbs[1];
  * a B-tree page = 16-byte header {pgno u64, pad u16, flags u16, lower u16,
    upper u16} + a node-offset array at byte 16; numkeys = (lower - 16) >> 1;
  * a node = {lo u16, hi u16, flags u16, ksize u16, key bytes, payload}. In a
    BRANCH page the child pgno is lo | hi<<16 | flags<<32; in a LEAF the data size
    is lo | hi<<16 and the payload follows the key inline — unless node flag
    F_BIGDATA (0x01), in which case the payload is an u64 overflow-page number and
    the value lives at overflow_pgno*psize + 16, contiguous across pages.

The fixture writer emits the same structures (sorted keys, nodes packed from the
page end, overflow pages for big values, dual meta pages) so tests can build
reference-layout stores; real reference shards parse with the identical code path.
DUPSORT/named-DB features are out of scope — the reference uses neither.
"""
from __future__ import annotations

import os
import struct
from typing import Dict, Iterator, List, Optional, Tuple

MDB_MAGIC = 0xBEEFC0DE
MDB_DATA_VERSION = 1

P_BRANCH = 0x01
P_LEAF = 0x02
P_OVERFLOW = 0x04
P_META = 0x08
P_LEAF2 = 0x20
F_BIGDATA = 0x01

_PAGEHDRSZ = 16
_NODEHDRSZ = 8
_META_STRUCT = struct.Struct("<IIQQ")          # magic, version, address, mapsize
_DB_STRUCT = struct.Struct("<IHH5Q")           # pad, flags, depth, b/l/o pages, entries, root
_TAIL_STRUCT = struct.Struct("<QQ")            # last_pg, txnid
_NODE_STRUCT = struct.Struct("<HHHH")          # lo, hi, flags, ksize
_INVALID_PGNO = 0xFFFFFFFFFFFFFFFF


def _env_data_path(path: str) -> str:
    return os.path.join(path, "data.mdb") if os.path.isdir(path) else path


class LMDBReader:
    """Read-only iterator/getter over one LMDB environment (dir or data.mdb file)."""

    def __init__(self, path: str):
        self.path = _env_data_path(path)
        with open(self.path, "rb") as f:
            self._data = f.read()
        meta = self._pick_meta()
        self.psize: int = meta["psize"]
        self.entries: int = meta["entries"]
        self._root: int = meta["root"]
        self._index: Optional[Dict[bytes, Tuple[int, int]]] = None

    # -------------------------------------------------------------- meta pages

    def _parse_meta(self, off: int) -> Optional[dict]:
        d = self._data
        if off + _PAGEHDRSZ + 136 > len(d):
            return None
        p = off + _PAGEHDRSZ
        magic, version, _addr, _mapsize = _META_STRUCT.unpack_from(d, p)
        if magic != MDB_MAGIC or version != MDB_DATA_VERSION:
            return None
        p += _META_STRUCT.size
        free_db = _DB_STRUCT.unpack_from(d, p)
        main_db = _DB_STRUCT.unpack_from(d, p + _DB_STRUCT.size)
        last_pg, txnid = _TAIL_STRUCT.unpack_from(d, p + 2 * _DB_STRUCT.size)
        return {"psize": free_db[0], "entries": main_db[6], "root": main_db[7],
                "last_pg": last_pg, "txnid": txnid}

    def _pick_meta(self) -> dict:
        m0 = self._parse_meta(0)
        if m0 is None:
            raise ValueError(f"{self.path}: not an LMDB data file (bad meta page 0)")
        m1 = self._parse_meta(m0["psize"])
        if m1 is not None and m1["txnid"] > m0["txnid"]:
            return m1
        return m0

    # -------------------------------------------------------------- tree walk

    def _page_nodes(self, pgno: int) -> Tuple[int, List[int]]:
        """(page flags, node offsets) for a B-tree page."""
        off = pgno * self.psize
        flags, lower = struct.unpack_from("<HH", self._data, off + 10)
        nkeys = (lower - _PAGEHDRSZ) >> 1
        ptrs = struct.unpack_from(f"<{nkeys}H", self._data, off + _PAGEHDRSZ)
        return flags, [off + p for p in ptrs]

    def _leaf_value(self, noff: int, ksize: int, lo: int, hi: int,
                    nflags: int) -> bytes:
        dsize = lo | (hi << 16)
        payload = noff + _NODEHDRSZ + ksize
        if nflags & F_BIGDATA:
            (ovpg,) = struct.unpack_from("<Q", self._data, payload)
            start = ovpg * self.psize + _PAGEHDRSZ
            return self._data[start:start + dsize]
        return self._data[payload:payload + dsize]

    def items(self) -> Iterator[Tuple[bytes, bytes]]:
        """All (key, value) pairs in key order (DFS over the B-tree)."""
        if self._root == _INVALID_PGNO:
            return
        stack = [self._root]
        # iterative DFS preserving order: expand branch children in reverse
        while stack:
            pgno = stack.pop()
            flags, noffs = self._page_nodes(pgno)
            if flags & P_BRANCH:
                children = []
                for noff in noffs:
                    lo, hi, nflags, _ks = _NODE_STRUCT.unpack_from(self._data, noff)
                    children.append(lo | (hi << 16) | (nflags << 32))
                stack.extend(reversed(children))
            elif flags & P_LEAF:
                for noff in noffs:
                    lo, hi, nflags, ksize = _NODE_STRUCT.unpack_from(self._data, noff)
                    key = self._data[noff + _NODEHDRSZ:noff + _NODEHDRSZ + ksize]
                    yield key, self._leaf_value(noff, ksize, lo, hi, nflags)
            else:
                raise ValueError(f"unexpected page flags {flags:#x} at pgno {pgno}")

    def keys(self) -> Iterator[bytes]:
        for k, _v in self.items():
            yield k

    def get(self, key: bytes) -> Optional[bytes]:
        """Point lookup (lazily builds a key -> node index on first use)."""
        if self._index is None:
            self._index = {}
            if self._root != _INVALID_PGNO:
                stack = [self._root]
                while stack:
                    flags, noffs = self._page_nodes(stack.pop())
                    for noff in noffs:
                        lo, hi, nflags, ksize = _NODE_STRUCT.unpack_from(
                            self._data, noff)
                        if flags & P_BRANCH:
                            stack.append(lo | (hi << 16) | (nflags << 32))
                        else:
                            k = self._data[noff + _NODEHDRSZ:
                                           noff + _NODEHDRSZ + ksize]
                            self._index[k] = (noff, (lo, hi, nflags, ksize))
        hit = self._index.get(key)
        if hit is None:
            return None
        noff, (lo, hi, nflags, ksize) = hit
        return self._leaf_value(noff, ksize, lo, hi, nflags)

    def __len__(self) -> int:
        return self.entries


# ------------------------------------------------------------------ fixture writer


def _even(n: int) -> int:
    return n + (n & 1)


def write_lmdb(path: str, items: Dict[bytes, bytes], psize: int = 4096) -> str:
    """Write a spec-conformant LMDB environment (dir with data.mdb) from a key/value
    dict. Test tooling: lets the converter be exercised against stores in the exact
    reference on-disk layout without the lmdb package. Values too big for half a page
    go to overflow pages (F_BIGDATA), keys are sorted, nodes pack from the page end,
    and both meta pages are emitted — the same structures liblmdb 0.9 writes."""
    os.makedirs(path, exist_ok=True)
    data_path = os.path.join(path, "data.mdb")
    keys = sorted(items)
    for k in keys:
        if _NODEHDRSZ + len(k) + 8 > psize // 2:
            raise ValueError(f"key too large: {len(k)} bytes")

    pages: List[bytes] = []          # data pages, pgno = 2 + index
    next_pgno = 2

    def page_header(pgno: int, flags: int, lower: int, upper: int) -> bytes:
        return struct.pack("<QHHHH", pgno, 0, flags, lower, upper)

    def overflow_header(pgno: int, npages: int) -> bytes:
        # P_OVERFLOW pages store the page count in the lower/upper union (pb_pages)
        return struct.pack("<QHHI", pgno, 0, P_OVERFLOW, npages)

    def alloc_overflow(value: bytes) -> int:
        nonlocal next_pgno
        npages = (len(value) + _PAGEHDRSZ + psize - 1) // psize
        first = next_pgno
        blob = overflow_header(first, npages) + value
        blob += b"\0" * (npages * psize - len(blob))
        for i in range(npages):
            pages.append(blob[i * psize:(i + 1) * psize])
        next_pgno += npages
        return first

    # ---- build leaf pages (nodes packed from the page end, ptrs at the front)
    leaf_entries: List[List[Tuple[bytes, bytes, int]]] = [[]]  # (key, node_payload, flags)
    space_left = psize - _PAGEHDRSZ
    n_overflow = 0
    for k in keys:
        v = items[k]
        inline_sz = _even(_NODEHDRSZ + len(k) + len(v))
        if inline_sz <= psize // 2 - _PAGEHDRSZ:
            node = (k, v, 0)
            need = inline_sz + 2
        else:
            ovpg = alloc_overflow(v)
            n_overflow += (len(v) + _PAGEHDRSZ + psize - 1) // psize
            node = (k, struct.pack("<Q", ovpg), F_BIGDATA, len(v))  # true dsize
            need = _even(_NODEHDRSZ + len(k) + 8) + 2
        if need > space_left:
            leaf_entries.append([])
            space_left = psize - _PAGEHDRSZ
        leaf_entries[-1].append(node)
        space_left -= need

    def emit_node(key: bytes, payload: bytes, nflags: int,
                  dsize: Optional[int] = None) -> bytes:
        size = dsize if dsize is not None else len(payload)
        raw = _NODE_STRUCT.pack(size & 0xFFFF, (size >> 16) & 0xFFFF,
                                nflags, len(key)) + key + payload
        return raw + b"\0" * (_even(len(raw)) - len(raw))

    def pack_btree_page(pgno: int, flags: int,
                        nodes: List[bytes]) -> bytes:
        upper = psize
        offsets = []
        body = bytearray(psize)
        for raw in nodes:
            upper -= len(raw)
            body[upper:upper + len(raw)] = raw
            offsets.append(upper)
        lower = _PAGEHDRSZ + 2 * len(nodes)
        assert lower <= upper, "page overflow in writer"
        body[:_PAGEHDRSZ] = page_header(pgno, flags, lower, upper)
        body[_PAGEHDRSZ:lower] = struct.pack(f"<{len(offsets)}H", *offsets)
        return bytes(body)

    def finish_leaf(entries) -> Tuple[int, bytes]:
        nonlocal next_pgno
        nodes = []
        for ent in entries:
            if len(ent) == 4:
                k, payload, fl, dsize = ent
                nodes.append(emit_node(k, payload, fl, dsize=dsize))
            else:
                k, v, fl = ent
                nodes.append(emit_node(k, v, fl))
        pgno = next_pgno
        next_pgno += 1
        return pgno, pack_btree_page(pgno, P_LEAF, nodes)

    level: List[Tuple[bytes, int]] = []   # (first key, pgno) per child
    n_leaf = 0
    if keys:
        for entries in leaf_entries:
            if not entries:
                continue
            pgno, blob = finish_leaf(entries)
            pages.append(blob)
            level.append((entries[0][0], pgno))
            n_leaf += 1

    # ---- build branch levels bottom-up
    depth = 1
    n_branch = 0
    while len(level) > 1:
        depth += 1
        parent: List[Tuple[bytes, int]] = []
        i = 0
        while i < len(level):
            subtree_first_key = level[i][0]
            group: List[Tuple[bytes, int]] = []
            space = psize - _PAGEHDRSZ
            while i < len(level):
                k, child = level[i]
                bkey = b"" if not group else k   # first branch key is empty in mdb
                need = _even(_NODEHDRSZ + len(bkey)) + 2
                if need > space:
                    break
                group.append((bkey, child))
                space -= need
                i += 1
            nodes = []
            for bkey, child in group:
                raw = _NODE_STRUCT.pack(child & 0xFFFF, (child >> 16) & 0xFFFF,
                                        (child >> 32) & 0xFFFF, len(bkey)) + bkey
                nodes.append(raw + b"\0" * (_even(len(raw)) - len(raw)))
            pgno = next_pgno
            next_pgno += 1
            pages.append(pack_btree_page(pgno, P_BRANCH, nodes))
            n_branch += 1
            parent.append((subtree_first_key, pgno))
        level = parent

    root = level[0][1] if level else _INVALID_PGNO

    # ---- meta pages
    def meta_page(pgno: int, txnid: int) -> bytes:
        hdr = struct.pack("<QHHHH", pgno, 0, P_META, _PAGEHDRSZ, psize)
        meta = _META_STRUCT.pack(MDB_MAGIC, MDB_DATA_VERSION, 0,
                                 max(next_pgno, 3) * psize)
        free_db = _DB_STRUCT.pack(psize, 0, 0, 0, 0, 0, 0, _INVALID_PGNO)
        main_db = _DB_STRUCT.pack(0, 0, depth if keys else 0, n_branch, n_leaf,
                                  n_overflow, len(keys),
                                  root if keys else _INVALID_PGNO)
        tail = _TAIL_STRUCT.pack(next_pgno - 1, txnid)
        blob = hdr + meta + free_db + main_db + tail
        return blob + b"\0" * (psize - len(blob))

    with open(data_path, "wb") as f:
        f.write(meta_page(0, 0))
        f.write(meta_page(1, 1))
        for blob in pages:
            f.write(blob)
    # lock file for layout completeness (py-lmdb creates one)
    open(os.path.join(path, "lock.mdb"), "wb").close()
    return data_path
