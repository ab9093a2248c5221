"""Independent Delta-protocol reader for validating the graft mirror.

A from-scratch, pure-Python implementation of the PUBLIC Delta Lake
protocol (reference PROTOCOL.md: action reconciliation 913-934, DV file
format 2567-2614, 64-bit RoaringBitmapArray portable format 2591-2614,
column mapping 462-492) plus the public RoaringFormatSpec for the inner
32-bit bitmaps. It shares ZERO code with the graft engine — stdlib +
pyarrow only — so agreement between this reader and a graft read of the
same mirrored table is genuine cross-implementation evidence, the same
role delta-spark would play where jars/egress exist
(python/tests/smoke_delta_spark_reader.py).

Supported: JSON commits, add/remove reconciliation by (path, dvId),
deletion vectors (storageType u/i/p), column mapping by physical name,
partition values from AddFile.partitionValues, versionAsOf, and classic
parquet checkpoints: a latest-version read seeds from `_last_checkpoint`
exactly like a real Delta reader (so the checkpoint CONTENT is
validated too); versionAsOf reads replay the JSON history instead and
require those commits to still exist.

Usage:
    from delta_mirror_reader import DeltaTable
    t = DeltaTable("/path/to/table")         # reads _delta_log
    rows = t.rows()                          # list of dicts, logical names
    rows_v0 = DeltaTable(path, version=0).rows()
"""

import json
import os
import struct
import zlib

import pyarrow.parquet as pq

PORTABLE_MAGIC = 1681511377  # PROTOCOL.md:2591

# Z85 alphabet (ZeroMQ RFC 32, referenced by PROTOCOL.md for DV uuids)
_Z85 = ("0123456789abcdefghijklmnopqrstuvwxyz"
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#")
_Z85_INV = {c: i for i, c in enumerate(_Z85)}


def z85_decode(s, out_len):
    assert len(s) % 5 == 0, "z85 length must be a multiple of 5"
    out = bytearray()
    for i in range(0, len(s), 5):
        v = 0
        for c in s[i:i + 5]:
            v = v * 85 + _Z85_INV[c]
        out += v.to_bytes(4, "big")
    return bytes(out[:out_len])


def _parse_roaring32(buf, pos):
    """One standard 32-bit RoaringBitmap (public RoaringFormatSpec).
    Returns (set of uint32 values, next position)."""
    (cookie,) = struct.unpack_from("<I", buf, pos)
    if (cookie & 0xFFFF) == 12347:  # SERIAL_COOKIE: run containers present
        size = (cookie >> 16) + 1
        pos += 4
        nbytes = (size + 7) // 8
        run_bitset = buf[pos:pos + nbytes]
        pos += nbytes
        has_offsets = size >= 4  # NO_OFFSET_THRESHOLD
    elif cookie == 12346:  # SERIAL_COOKIE_NO_RUNCONTAINER
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        pos += 8
        run_bitset = None
        has_offsets = True
    else:
        raise ValueError("bad roaring cookie %d at %d" % (cookie, pos))
    keys_cards = []
    for _ in range(size):
        key, card_m1 = struct.unpack_from("<HH", buf, pos)
        pos += 4
        keys_cards.append((key, card_m1 + 1))
    if has_offsets:
        pos += 4 * size  # offsets are redundant for sequential parsing
    values = set()
    for i, (key, card) in enumerate(keys_cards):
        base = key << 16
        is_run = run_bitset is not None and (run_bitset[i // 8] >> (i % 8)) & 1
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.update(range(base + start, base + start + length + 1))
        elif card <= 4096:  # array container
            vals = struct.unpack_from("<%dH" % card, buf, pos)
            pos += 2 * card
            values.update(base + v for v in vals)
        else:  # bitmap container: 1024 x 64-bit words
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    b = (w & -w).bit_length() - 1
                    values.add(base + wi * 64 + b)
                    w &= w - 1
    return values, pos


def parse_roaring_bitmap_array(data):
    """64-bit RoaringBitmapArray, portable format (PROTOCOL.md:2591-2614):
    <magic i32 LE> <numBitmaps i64 LE> then per bitmap <key i32 LE> +
    standard 32-bit serialization. Returns a set of uint64 row indices."""
    (magic,) = struct.unpack_from("<i", data, 0)
    assert magic == PORTABLE_MAGIC, "bad RoaringBitmapArray magic %d" % magic
    (n,) = struct.unpack_from("<q", data, 4)
    pos = 12
    rows = set()
    for _ in range(n):
        (key,) = struct.unpack_from("<i", data, pos)
        pos += 4
        vals, pos = _parse_roaring32(data, pos)
        rows.update((key << 32) | v for v in vals)
    return rows


def _read_dv_file(path, offset, size_in_bytes):
    """DV file framing (PROTOCOL.md:2567-2589): 1-byte version, then per
    DV <dataSize i32 BE> <bitmap bytes> <crc32 i32 BE>; `offset` points
    at the dataSize field."""
    with open(path, "rb") as f:
        version = f.read(1)[0]
        assert version == 1, "unsupported DV file version %d" % version
        f.seek(offset)
        (data_size,) = struct.unpack(">i", f.read(4))
        assert data_size == size_in_bytes, (data_size, size_in_bytes)
        data = f.read(data_size)
        (crc,) = struct.unpack(">i", f.read(4))
        assert (zlib.crc32(data) & 0xFFFFFFFF) == (crc & 0xFFFFFFFF), \
            "DV crc mismatch in %s" % path
    return data


def resolve_dv(table_root, desc):
    """DV descriptor -> set of deleted row indices (PROTOCOL.md 634-694)."""
    st = desc["storageType"]
    if st == "i":
        data = z85_decode(desc["pathOrInlineDv"], desc["sizeInBytes"])
        return parse_roaring_bitmap_array(data)
    if st == "p":
        p = desc["pathOrInlineDv"]
        if p.startswith("file:"):
            from urllib.parse import urlparse, unquote
            p = unquote(urlparse(p).path)
        return parse_roaring_bitmap_array(
            _read_dv_file(p, desc["offset"], desc["sizeInBytes"]))
    if st == "u":
        poi = desc["pathOrInlineDv"]
        prefix, uuid_z85 = poi[:-20], poi[-20:]
        ub = z85_decode(uuid_z85, 16)
        import uuid as uuid_mod
        u = uuid_mod.UUID(bytes=ub)
        d = os.path.join(table_root, prefix) if prefix else table_root
        name = "deletion_vector_%s.bin" % u
        cand = os.path.join(d, name)
        if not os.path.exists(cand):
            matches = [f for f in os.listdir(d) if f.endswith(name)]
            assert len(matches) == 1, "DV file %s not found under %s" % (name, d)
            cand = os.path.join(d, matches[0])
        return parse_roaring_bitmap_array(
            _read_dv_file(cand, desc["offset"], desc["sizeInBytes"]))
    raise ValueError("unknown DV storageType %r" % st)


def _cast_partition_value(raw, sql_type):
    """PROTOCOL.md partition-value serialization (strings in the log)."""
    if raw is None or raw == "":
        return None
    if sql_type in ("long", "integer", "short", "byte"):
        return int(raw)
    if sql_type in ("double", "float"):
        return float(raw)
    if sql_type == "boolean":
        return raw == "true"
    return raw  # string/date/timestamp stay textual here


class DeltaTable:
    def __init__(self, path, version=None):
        self.root = path
        log_dir = os.path.join(path, "_delta_log")
        commits = sorted(f for f in os.listdir(log_dir)
                         if f.endswith(".json") and f[:-5].isdigit())
        assert commits, "no JSON commits under %s" % log_dir
        self.metadata = None
        self.protocol = None
        files = {}  # (path, dvId) -> add action
        cp_version = -1
        lc_path = os.path.join(log_dir, "_last_checkpoint")
        if version is None and os.path.exists(lc_path):
            # Seed from the checkpoint like a real Delta reader (this
            # also validates the checkpoint parquet's content).
            # versionAsOf reads stay on the full JSON replay path below.
            with open(lc_path) as f:
                lc = json.load(f)
            cp_version = lc["version"]
            parts = lc.get("parts")
            if parts:
                names = ["%020d.checkpoint.%010d.%010d.parquet"
                         % (cp_version, i + 1, parts) for i in range(parts)]
            else:
                names = ["%020d.checkpoint.parquet" % cp_version]
            for name in names:
                for rec in pq.read_table(
                        os.path.join(log_dir, name)).to_pylist():
                    if rec.get("metaData"):
                        self.metadata = _demap(rec["metaData"])
                    elif rec.get("protocol"):
                        self.protocol = _demap(rec["protocol"])
                    elif rec.get("add"):
                        a = _demap(rec["add"])
                        files[(a["path"], _dv_id(a))] = a
                    # checkpoint `remove` rows are expired-tombstone
                    # bookkeeping for VACUUM, not live state — ignored
        for c in commits:
            v = int(c[:-5])
            if v <= cp_version:
                continue
            if version is not None and v > version:
                break
            with open(os.path.join(log_dir, c)) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    action = json.loads(line)
                    if "metaData" in action:
                        self.metadata = action["metaData"]
                    elif "protocol" in action:
                        self.protocol = action["protocol"]
                    elif "add" in action:
                        a = action["add"]
                        files[(a["path"], _dv_id(a))] = a
                    elif "remove" in action:
                        r = action["remove"]
                        files.pop((r["path"], _dv_id(r)), None)
        assert self.metadata is not None, "log has no metaData"
        self.files = list(files.values())
        self.schema = json.loads(self.metadata["schemaString"])
        conf = self.metadata.get("configuration", {})
        self.mapping = conf.get("delta.columnMapping.mode", "none") != "none"

    def _columns(self):
        """[(logical name, physical name, sql type)] for top-level fields."""
        out = []
        for f in self.schema["fields"]:
            phys = f["name"]
            if self.mapping:
                phys = f.get("metadata", {}).get(
                    "delta.columnMapping.physicalName", f["name"])
            out.append((f["name"], phys, f["type"]
                        if isinstance(f["type"], str) else "struct"))
        return out

    def rows(self):
        """All live rows as dicts keyed by LOGICAL column names."""
        cols = self._columns()
        part_cols = self.metadata.get("partitionColumns", [])
        # partitionColumns in metaData are PHYSICAL names under mapping
        # (PROTOCOL.md column mapping: partition values keyed likewise)
        phys_to_logical = {p: l for (l, p, _) in cols}
        out = []
        for a in self.files:
            fpath = os.path.join(self.root, a["path"])
            table = pq.read_table(fpath)
            deleted = set()
            if a.get("deletionVector"):
                deleted = resolve_dv(self.root, a["deletionVector"])
            file_cols = set(table.column_names)
            pv = a.get("partitionValues", {})
            data = table.to_pylist()
            for idx, rec in enumerate(data):
                if idx in deleted:
                    continue
                row = {}
                for (logical, phys, sql_type) in cols:
                    if phys in file_cols:
                        row[logical] = rec[phys]
                    else:
                        raw = pv.get(phys, pv.get(logical))
                        row[logical] = _cast_partition_value(raw, sql_type)
                out.append(row)
        return out


def _demap(rec):
    """pyarrow renders parquet MAP columns as [(k, v), ...]; JSON actions
    carry plain dicts — normalize checkpoint rows to the JSON shape,
    recursively, and drop None-valued struct members so absent optional
    fields look the same on both paths."""
    if isinstance(rec, list) and all(
            isinstance(e, tuple) and len(e) == 2 for e in rec):
        return {k: v for k, v in rec}
    if isinstance(rec, dict):
        return {k: _demap(v) for k, v in rec.items() if v is not None}
    return rec


def _dv_id(action):
    dv = action.get("deletionVector")
    if not dv:
        return None
    return (dv["storageType"], dv["pathOrInlineDv"], dv.get("offset") or 0)


if __name__ == "__main__":
    import sys
    t = DeltaTable(sys.argv[1],
                   version=int(sys.argv[2]) if len(sys.argv) > 2 else None)
    rows = t.rows()
    print(json.dumps({"count": len(rows),
                      "columns": sorted(rows[0]) if rows else []}))
