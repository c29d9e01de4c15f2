#!/usr/bin/env python3
"""Cross-engine conformance check for the lakehouse WRITE paths.

The graded queries only ever read the Delta/Iceberg tables this engine
writes back through this engine's OWN readers — a self-consistent bug
(writer and reader agreeing on a spec misreading) would pass every
oracle. This script closes that loop with a SECOND, independent
implementation: pure-Python interpretation of the table metadata
(Delta JSON commit log; Iceberg version-hint/metadata.json/Avro
manifest lists/manifests, decoded by a from-scratch Avro OCF reader
with null/deflate/snappy codecs) and DuckDB scanning the raw parquet
data files. No Spark, no engine code, no shared parsing library.

Checked fixtures (written by graft.Verify's run of the graded queries):

  q_delta_part_dml  /tmp/graft_deltaw_<hex(sfDir.hashCode)>/orders_pdml
      partitioned Delta table after create + DELETE + UPDATE + MERGE.
      Replays the JSON log at versions 0..3 (adds minus removes), scans
      the live files with DuckDB, recovers the partition column from
      each add's partitionValues (the files do NOT carry it), and
      compares (n_rows, total_cents) per version plus the per-priority
      census at v3 against the engine's Verify dump.

  q_delta_dv        /tmp/graft_deltaw_<hex(sfDir.hashCode)>/orders_dv
      Delta table whose two DELETEs committed DELETION VECTORS instead
      of rewrites. The checker decodes the descriptors itself — Z85,
      the DV file frame (BE size + payload + CRC32), and the 64-bit
      RoaringBitmapArray (array/bitset containers) — and applies the
      masks by (file, row-ordinal) anti-join in DuckDB.

  q_iceberg_dml     /tmp/graft_iceberg_<hex(sfDir.hashCode)>/orders_dml
      Iceberg v2 table after create + two position-delete commits.
      Walks version-hint → metadata.json → manifest-list Avro →
      manifest Avro per snapshot, reads the position-delete parquet
      with DuckDB, anti-joins on (file, row ordinal) under the spec's
      sequence rule (pos delete applies to data seq <= delete seq),
      and compares (n_rows, total_cents) per snapshot against the dump.

  q_lake_sql_dml_ice  /tmp/graft_iceberg_<hex(sfDir.hashCode)>/sqldelice
      Catalog-SQL DML on Iceberg: i2 (v2) after two SupportsDelete
      position-delete commits, a WriteDelta UPDATE (staged changed-row
      files + a delete file), and a MERGE; i3 (v3) after a DV delete
      and a DV-union UPDATE. Censused at historical snapshots too —
      old snapshots must not see later delete files.

  q_hudi_partitioned  /tmp/graft_hudi_<hex(sfDir.hashCode)>/orders_part
      Hive-partitioned Hudi CoW table after create + an upsert that
      updates one partition and births another. Reads the timeline
      (.hoodie/<instant>.commit), resolves the live slice per
      (partition dir, fileId) group — latest committed instant wins —
      and re-derives all three graded phases: per-partition censuses
      WITH live-file counts (partition values parsed from the hive
      dirs), the full snapshot, and the incremental read of the upsert
      instant (groups whose latest slice is that instant, rows
      filtered on _hoodie_commit_time).

  q_delta_composed  /tmp/graft_deltaw_<hex>/orders_composed
      the all-features-on Delta table (column mapping mode=name + hive
      partitioning + row tracking + DVs + clustering) across its nine
      versions — physical names and partition keys resolved from the
      log's mapping metadata, DV masks decoded independently, the
      metadata-only ADD COLUMN + widening phases proven content-stable.

  q_iceberg_spec_evolution  /tmp/graft_iceberg_<hex>/specevo
      partition-SPEC-evolved Iceberg table: per-era manifest pruning
      (identity era by priority, month-transform era by ordinal window)
      re-derived from the manifest-list's partition_spec_id tags; the
      planned file counts and residual censuses must match the dump.

Usage:  python3 scripts/lake_conformance.py <sfDir> <verifyOutDir>

Exit 0 = every comparison matched; 1 = any mismatch (diffs printed).

Path matching note: delete-file `file_path` values and DuckDB's
`filename` both resolve to the same physical files but may differ in
scheme/absoluteness; this checker joins on basename, which is unique
within a table for the layouts under test (data/s<snap>-<i>.parquet).
"""
import json
import os
import re
import struct
import sys
import zlib

import duckdb

# ---------------------------------------------------------------------------
# Fixture location: Java String.hashCode of the sfDir string, hex-printed
# exactly like Integer.toHexString (unsigned 32-bit).


def java_hash_hex(s: str) -> str:
    h = 0
    for c in s:
        h = (31 * h + ord(c)) & 0xFFFFFFFF
    return format(h, "x")


# ---------------------------------------------------------------------------
# Raw snappy decompression (the Avro "snappy" codec's block payload).
# Format: varint uncompressed length, then literal/copy elements.


def snappy_decompress(data: bytes) -> bytes:
    pos = 0
    # preamble varint = uncompressed length
    ulen = 0
    shift = 0
    while True:
        b = data[pos]
        pos += 1
        ulen |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    out = bytearray()
    while pos < len(data):
        tag = data[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            n = tag >> 2
            if n >= 60:  # 60..63 → that many extra length bytes
                extra = n - 59
                n = int.from_bytes(data[pos:pos + extra], "little")
                pos += extra
            n += 1
            out += data[pos:pos + n]
            pos += n
        else:
            if kind == 1:  # copy, 1-byte offset
                length = ((tag >> 2) & 0x7) + 4
                offset = ((tag >> 5) << 8) | data[pos]
                pos += 1
            elif kind == 2:  # copy, 2-byte offset
                length = (tag >> 2) + 1
                offset = int.from_bytes(data[pos:pos + 2], "little")
                pos += 2
            else:  # copy, 4-byte offset
                length = (tag >> 2) + 1
                offset = int.from_bytes(data[pos:pos + 4], "little")
                pos += 4
            if offset == 0 or offset > len(out):
                raise ValueError("snappy: bad copy offset")
            start = len(out) - offset
            for i in range(length):  # overlapping copies are byte-serial
                out.append(out[start + i])
    if len(out) != ulen:
        raise ValueError(f"snappy: expected {ulen} bytes, got {len(out)}")
    return bytes(out)


# ---------------------------------------------------------------------------
# Avro Object Container File reader (spec 1.11.x). Decodes the embedded
# writer schema generically — enough for Spark-written record files.


class _Buf:
    def __init__(self, data: bytes):
        self.b = data
        self.p = 0

    def read(self, n: int) -> bytes:
        d = self.b[self.p:self.p + n]
        if len(d) != n:
            raise EOFError("avro: short read")
        self.p += n
        return d

    def eof(self) -> bool:
        return self.p >= len(self.b)


def _zigzag_long(buf: _Buf) -> int:
    n = 0
    shift = 0
    while True:
        b = buf.read(1)[0]
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (n >> 1) ^ -(n & 1)


def _read_bytes(buf: _Buf) -> bytes:
    return buf.read(_zigzag_long(buf))


def _decode(schema, buf: _Buf):
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return None
        if t == "boolean":
            return buf.read(1)[0] != 0
        if t in ("int", "long"):
            return _zigzag_long(buf)
        if t == "float":
            return struct.unpack("<f", buf.read(4))[0]
        if t == "double":
            return struct.unpack("<d", buf.read(8))[0]
        if t == "bytes":
            return _read_bytes(buf)
        if t == "string":
            return _read_bytes(buf).decode("utf-8")
        raise ValueError(f"avro: unsupported primitive {t}")
    if isinstance(schema, list):  # union: zigzag branch index, then value
        return _decode(schema[_zigzag_long(buf)], buf)
    t = schema["type"]
    if t == "record":
        return {f["name"]: _decode(f["type"], buf) for f in schema["fields"]}
    if t == "enum":
        return schema["symbols"][_zigzag_long(buf)]
    if t == "fixed":
        return buf.read(schema["size"])
    if t == "array":
        out = []
        while True:
            n = _zigzag_long(buf)
            if n == 0:
                return out
            if n < 0:  # block with byte size prefix
                n = -n
                _zigzag_long(buf)
            for _ in range(n):
                out.append(_decode(schema["items"], buf))
    if t == "map":
        out = {}
        while True:
            n = _zigzag_long(buf)
            if n == 0:
                return out
            if n < 0:
                n = -n
                _zigzag_long(buf)
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = _decode(schema["values"], buf)
    if isinstance(t, (dict, list)):  # nested/named wrapper
        return _decode(t, buf)
    raise ValueError(f"avro: unsupported type {t}")


def read_avro(path: str):
    """All records of an Avro OCF as a list of dicts."""
    buf = _Buf(open(path, "rb").read())
    if buf.read(4) != b"Obj\x01":
        raise ValueError(f"{path}: not an Avro object container file")
    meta = {}
    while True:
        n = _zigzag_long(buf)
        if n == 0:
            break
        if n < 0:
            n = -n
            _zigzag_long(buf)
        for _ in range(n):
            k = _read_bytes(buf).decode("utf-8")
            meta[k] = _read_bytes(buf)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    sync = buf.read(16)
    records = []
    while not buf.eof():
        count = _zigzag_long(buf)
        size = _zigzag_long(buf)
        block = buf.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec == "snappy":
            block = snappy_decompress(block[:-4])  # trailing 4-byte CRC
        elif codec != "null":
            raise ValueError(f"{path}: unsupported avro codec {codec}")
        bb = _Buf(block)
        for _ in range(count):
            records.append(_decode(schema, bb))
        if buf.read(16) != sync:
            raise ValueError(f"{path}: avro sync marker mismatch")
    return records


# ---------------------------------------------------------------------------
# Delta deletion vectors: Z85 codec + DV file frame + 64-bit
# RoaringBitmapArray decode (array/bitset containers; RUN containers —
# which this engine's writer never emits — fail loudly, not silently).

Z85 = ("0123456789abcdefghijklmnopqrstuvwxyz"
       "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#")
Z85_INV = {c: i for i, c in enumerate(Z85)}


def z85_decode(s: str) -> bytes:
    if len(s) % 5:
        raise ValueError(f"z85 length {len(s)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(s), 5):
        v = 0
        for c in s[i:i + 5]:
            v = v * 85 + Z85_INV[c]
        out += v.to_bytes(4, "big")
    return bytes(out)


def roaring_positions(payload: bytes):
    """Sorted row indexes of a RoaringBitmapArray payload."""
    if int.from_bytes(payload[0:4], "little") != 1681511377:
        raise ValueError("bad RoaringBitmapArray magic")
    n_maps = int.from_bytes(payload[4:12], "little")
    pos, out = 12, []
    for high in range(n_maps):
        cookie = int.from_bytes(payload[pos:pos + 4], "little")
        if cookie & 0xFFFF == 12347:
            raise ValueError("RUN-container roaring bitmap — not covered "
                             "by this checker (engine writer never emits it)")
        if cookie != 12346:
            raise ValueError(f"bad roaring cookie {cookie}")
        n = int.from_bytes(payload[pos + 4:pos + 8], "little")
        hdr = pos + 8
        keys, cards = [], []
        for i in range(n):
            keys.append(int.from_bytes(payload[hdr + 4 * i:hdr + 4 * i + 2], "little"))
            cards.append(int.from_bytes(
                payload[hdr + 4 * i + 2:hdr + 4 * i + 4], "little") + 1)
        p = hdr + 4 * n + 4 * n  # skip the offset header
        for key, card in zip(keys, cards):
            if card <= 4096:
                vals = [int.from_bytes(payload[p + 2 * j:p + 2 * j + 2], "little")
                        for j in range(card)]
                p += 2 * card
            else:
                vals = [b * 8 + bit for b in range(8192)
                        if payload[p + b]
                        for bit in range(8) if payload[p + b] >> bit & 1]
                p += 8192
            out += [(high << 32) | (key << 16) | v for v in vals]
        pos = p
    return out


def dv_positions(base: str, dv: dict):
    """Decode an add action's deletionVector descriptor to positions."""
    st = dv["storageType"]
    size = dv["sizeInBytes"]
    if st == "i":
        payload = z85_decode(dv["pathOrInlineDv"])[:size]
    elif st in ("u", "p"):
        if st == "p":
            path = dv["pathOrInlineDv"]
        else:
            s = dv["pathOrInlineDv"]
            prefix, z = s[:-20], s[-20:]
            raw = z85_decode(z)
            u = raw.hex()
            uuid = f"{u[0:8]}-{u[8:12]}-{u[12:16]}-{u[16:20]}-{u[20:32]}"
            d = os.path.join(base, prefix) if prefix else base
            path = os.path.join(d, f"deletion_vector_{uuid}.bin")
        blob = open(path, "rb").read()
        off = dv.get("offset", 0)
        n = int.from_bytes(blob[off:off + 4], "big")
        if n != size:
            raise ValueError(f"DV frame size {n} != descriptor {size}")
        payload = blob[off + 4:off + 4 + n]
        crc = zlib.crc32(payload) & 0xFFFFFFFF
        if crc != int.from_bytes(blob[off + 4 + n:off + 8 + n], "big"):
            raise ValueError("DV payload CRC mismatch")
    else:
        raise ValueError(f"unknown DV storageType {st}")
    got = roaring_positions(payload)
    if len(got) != dv.get("cardinality", len(got)):
        raise ValueError(
            f"DV cardinality {dv['cardinality']} != decoded {len(got)}")
    return got


# ---------------------------------------------------------------------------
# Delta: replay the JSON commit log independently.


def delta_state(base: str, version: int, with_schema: bool = False):
    """(adds: {path: action}, partition_columns[, schemaString]) at `version`."""
    logdir = os.path.join(base, "_delta_log")
    adds, part_cols, schema = {}, [], None
    for v in range(version + 1):
        p = os.path.join(logdir, f"{v:020d}.json")
        if not os.path.exists(p):
            raise FileNotFoundError(f"missing Delta commit {p}")
        for line in open(p):
            line = line.strip()
            if not line:
                continue
            action = json.loads(line)
            if "metaData" in action:
                part_cols = action["metaData"].get("partitionColumns", [])
                schema = action["metaData"].get("schemaString", schema)
            elif "add" in action:
                a = action["add"]
                adds[a["path"]] = a
            elif "remove" in action:
                adds.pop(action["remove"]["path"], None)
    if with_schema:
        return adds, part_cols, schema
    return adds, part_cols


def delta_census(con, base: str, version: int):
    """[(partition_value_or_*, n_rows, total_cents)] from a raw scan,
    deletion vectors applied by (file, row-ordinal) anti-join."""
    adds, part_cols = delta_state(base, version)
    if not adds:
        return [("*", 0, 0)]
    per_file = {}
    for path, a in adds.items():
        full = os.path.join(base, path)
        dv = a.get("deletionVector")
        if dv:
            masked = dv_positions(base, dv)
            n, s = con.execute(
                "SELECT count(*), coalesce(sum(cents), 0) "
                "FROM read_parquet(?, file_row_number=true) "
                "WHERE file_row_number NOT IN (SELECT unnest(?::BIGINT[]))",
                [full, masked]).fetchone()
        else:
            n, s = con.execute(
                "SELECT count(*), coalesce(sum(cents), 0) FROM read_parquet(?)",
                [full]).fetchone()
        pv = a.get("partitionValues", {})
        key = pv.get(part_cols[0], "*") if part_cols else "*"
        agg = per_file.setdefault(key, [0, 0])
        agg[0] += n
        agg[1] += s
    return sorted((k, n, s) for k, (n, s) in per_file.items())


# ---------------------------------------------------------------------------
# Iceberg: version-hint → metadata.json → manifest list → manifests.


def ice_meta(base: str):
    hint = os.path.join(base, "metadata", "version-hint.text")
    v = int(open(hint).read().strip())
    meta = json.load(open(os.path.join(base, "metadata", f"v{v}.metadata.json")))
    return meta


def ice_resolve(base: str, p: str) -> str:
    return p if os.path.isabs(p) else os.path.join(base, p)


def ice_plan(base: str, meta: dict, snapshot_id: int):
    """(data_files, pos_delete_files, dvs) — data/pos as [(path, seq)],
    dvs as [(referenced_path, puffin_path, content_offset)] (the v3
    shape: at most one DELETION VECTOR per data file, applied
    regardless of sequence)."""
    snap = next(s for s in meta["snapshots"] if s["snapshot-id"] == snapshot_id)
    data, pos_del, dvs = [], [], []
    for ml in read_avro(ice_resolve(base, snap["manifest-list"])):
        for e in read_avro(ice_resolve(base, ml["manifest_path"])):
            if e["status"] == 2:  # DELETED entry: not part of this snapshot
                continue
            df = e["data_file"]
            seq = e.get("sequence_number", 0)
            content = df.get("content", 0)
            path = ice_resolve(base, df["file_path"])
            if content == 0:
                data.append((path, seq))
            elif content == 1 and df.get("referenced_data_file"):
                dvs.append((ice_resolve(base, df["referenced_data_file"]),
                            path, df["content_offset"]))
            elif content == 1:
                pos_del.append((path, seq))
            else:
                raise ValueError(
                    f"{base}: content={content} (equality deletes) not "
                    "covered by this checker")
    return data, pos_del, dvs


def puffin_frame_positions(path: str, offset: int):
    """Decode the v3 deletion-vector blob at `offset` in a Puffin file:
    <4B BE length><magic D1D33964 + 64-bit roaring><4B BE CRC32> — the
    payload is byte-compatible with Delta's DV format."""
    blob = open(path, "rb").read()
    n = int.from_bytes(blob[offset:offset + 4], "big")
    payload = blob[offset + 4:offset + 4 + n]
    crc = zlib.crc32(payload) & 0xFFFFFFFF
    if crc != int.from_bytes(blob[offset + 4 + n:offset + 8 + n], "big"):
        raise ValueError(f"puffin DV blob CRC mismatch at {path}+{offset}")
    return roaring_positions(payload)


def ice_census(con, base: str, snapshot_id: int):
    """(n_rows, total_cents) for a snapshot, deletes applied by DuckDB."""
    meta = ice_meta(base)
    data, pos_del, dvs = ice_plan(base, meta, snapshot_id)
    if not data:
        return (0, 0)
    # one UNION branch per distinct data sequence number, so the spec's
    # rule (a position delete applies to data files with seq <= its own)
    # is an inequality join on constants
    rows_sql = """
        SELECT parse_filename(filename) AS f, file_row_number AS pos,
               cents, ? AS dseq
        FROM read_parquet(?, filename=true, file_row_number=true)
    """
    branches, params = [], []
    by_seq = {}
    for path, seq in data:
        by_seq.setdefault(seq, []).append(path)
    for seq, paths in by_seq.items():
        branches.append(rows_sql)
        params += [seq, paths]
    live = " UNION ALL ".join(branches)
    if pos_del or dvs:
        del_sql = """
            SELECT parse_filename(file_path) AS f, pos, ? AS dseq
            FROM read_parquet(?)
        """
        dbranches, dparams = [], []
        by_dseq = {}
        for path, seq in pos_del:
            by_dseq.setdefault(seq, []).append(path)
        for seq, paths in by_dseq.items():
            dbranches.append(del_sql)
            dparams += [seq, paths]
        if dvs:
            # a v3 DV masks its referenced file unconditionally — model
            # it as a delete row with an unreachable sequence number
            con.execute("CREATE OR REPLACE TEMP TABLE dv_rows (f VARCHAR, pos BIGINT)")
            for ref, puffin, off in dvs:
                f = os.path.basename(ref)
                con.executemany("INSERT INTO dv_rows VALUES (?, ?)",
                                [(f, p) for p in puffin_frame_positions(puffin, off)])
            dbranches.append(
                "SELECT f, pos, 4611686018427387904 AS dseq FROM dv_rows")
        dels = " UNION ALL ".join(dbranches)
        q = f"""
            WITH data AS ({live}), dels AS ({dels})
            SELECT count(*), coalesce(sum(cents), 0) FROM data
            WHERE NOT EXISTS (
              SELECT 1 FROM dels
              WHERE dels.f = data.f AND dels.pos = data.pos
                AND dels.dseq >= data.dseq)
        """
        return con.execute(q, params + dparams).fetchone()
    return con.execute(
        f"SELECT count(*), coalesce(sum(cents), 0) FROM ({live})",
        params).fetchone()


# ---------------------------------------------------------------------------
# Hudi: timeline + file-name grammar, live slice per (partition, group).

HUDI_NAME = re.compile(r"^(.+?)_([0-9]+-[0-9]+-[0-9]+)_([0-9]+)\.parquet$")


def hudi_unescape(s: str) -> str:
    out, i = [], 0
    while i < len(s):
        if s[i] == "%" and i + 3 <= len(s):
            out.append(chr(int(s[i + 1:i + 3], 16)))
            i += 3
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


def hudi_slices(base: str):
    """{(partition_value, fileId): (instant, path)} — live slices at the
    latest completed commit; partition value decoded from the hive dir."""
    hoodie = os.path.join(base, ".hoodie")
    commits = sorted(f[:-7] for f in os.listdir(hoodie) if f.endswith(".commit"))
    if not commits:
        raise ValueError(f"{base}: no completed commits")
    last = commits[-1]
    groups = {}
    for root, dirs, files in os.walk(base):
        if root.startswith(hoodie):
            continue
        for f in files:
            m = HUDI_NAME.match(f)
            if not m:
                continue
            fid, _, instant = m.groups()
            if instant not in commits or instant > last:
                continue
            rel = os.path.relpath(root, base)
            seg = "" if rel == "." else rel
            pval = hudi_unescape(seg.split("=", 1)[1]) if "=" in seg else ""
            key = (pval, fid)
            if key not in groups or groups[key][0] < instant:
                groups[key] = (instant, os.path.join(root, f))
    return groups


def check_hudi(con, base: str, outdir: str):
    failures = []
    engine = dump_rows(con, outdir, "q_hudi_partitioned")
    groups = hudi_slices(base)
    # phase 1: per-partition census + live-file count
    by_part = {}
    for (pval, _), (_, path) in groups.items():
        by_part.setdefault(pval, []).append(path)
    ext1 = []
    for pval in sorted(by_part):
        n, s = con.execute(
            "SELECT count(*), coalesce(sum(cents), 0) FROM read_parquet(?)",
            [by_part[pval]]).fetchone()
        ext1.append((1, pval, len(by_part[pval]), n, s))
    eng1 = sorted(tuple(r) for r in engine if r[0] == 1)
    if eng1 != ext1:
        failures.append(f"hudi per-partition: external {ext1} vs engine {eng1}")
    # phase 2: full snapshot
    allp = [p for ps in by_part.values() for p in ps]
    n, s = con.execute(
        "SELECT count(*), coalesce(sum(cents), 0) FROM read_parquet(?)",
        [allp]).fetchone()
    eng2 = [tuple(r) for r in engine if r[0] == 2]
    if eng2 != [(2, "*", len(allp), n, s)]:
        failures.append(
            f"hudi full: external {(2, '*', len(allp), n, s)} vs engine {eng2}")
    # phase 3: incremental read of the LAST instant — groups whose live
    # slice is that instant, rows it actually wrote
    last = max(i for i, _ in groups.values())
    inc = [p for i, p in groups.values() if i == last]
    n, s = con.execute(
        "SELECT count(*), coalesce(sum(cents), 0) FROM read_parquet(?) "
        "WHERE _hoodie_commit_time = ?", [inc, last]).fetchone()
    eng3 = [tuple(r) for r in engine if r[0] == 3]
    if eng3 != [(3, "*", len(inc), n, s)]:
        failures.append(
            f"hudi incremental: external {(3, '*', len(inc), n, s)} vs engine {eng3}")
    return failures


# ---------------------------------------------------------------------------
# Comparison against the engine's Verify dumps.


def dump_rows(con, outdir: str, name: str):
    # graft.Verify writes outDir/<name>/; ad-hoc dumps use <name>.parquet/
    d = os.path.join(outdir, name)
    if not os.path.isdir(d):
        d = os.path.join(outdir, name + ".parquet")
    glob_path = os.path.join(d, "*.parquet")
    return con.execute(
        f"SELECT * FROM read_parquet('{glob_path}')").fetchall()


def check_delta(con, base: str, outdir: str):
    failures = []
    engine = dump_rows(con, outdir, "q_delta_part_dml")
    # phases 0..3: (phase, '*', n_rows, total_cents) per log version
    for phase in range(4):
        ext = delta_census(con, base, phase)
        n = sum(r[1] for r in ext)
        s = sum(r[2] for r in ext)
        eng = [r for r in engine if r[0] == phase and r[1] == "*"]
        if len(eng) != 1 or (eng[0][2], eng[0][3]) != (n, s):
            failures.append(
                f"delta v{phase}: external (n={n}, cents={s}) "
                f"vs engine {eng}")
    # phase 4: per-priority census at v3 — partition values recovered
    # from the log, never from the data files
    ext4 = delta_census(con, base, 3)
    eng4 = sorted((r[1], r[2], r[3]) for r in engine if r[0] == 4)
    if eng4 != ext4:
        failures.append(f"delta by-partition: external {ext4} vs engine {eng4}")
    return failures


def check_delta_dv(con, base: str, outdir: str):
    """q_delta_dv: DV-masked censuses at versions 0..2 — exercises the
    z85/frame/roaring decode path against the engine's own masks."""
    failures = []
    engine = {r[0]: (r[1], r[2]) for r in dump_rows(con, outdir, "q_delta_dv")}
    for version in sorted(engine):
        ext = delta_census(con, base, version)
        n = sum(r[1] for r in ext)
        s = sum(r[2] for r in ext)
        if (n, s) != tuple(engine[version]):
            failures.append(
                f"delta-dv v{version}: external ({n}, {s}) "
                f"vs engine {tuple(engine[version])}")
    return failures


def check_iceberg(con, base: str, outdir: str, dump: str = "q_iceberg_dml"):
    failures = []
    engine = {r[0]: (r[1], r[2]) for r in dump_rows(con, outdir, dump)}
    for snap in sorted(engine):
        ext = ice_census(con, base, snap)
        if tuple(ext) != tuple(engine[snap]):
            failures.append(
                f"iceberg snapshot {snap}: external {tuple(ext)} "
                f"vs engine {tuple(engine[snap])}")
    return failures


def check_iceberg_v3(con, base: str, outdir: str):
    """q_iceberg_v3_dv: format-v3 table whose deletes are Puffin
    deletion-vector blobs located by the manifest's content_offset."""
    return check_iceberg(con, base, outdir, dump="q_iceberg_v3_dv")


def check_iceberg_sql_dml(con, root: str, outdir: str):
    """q_lake_sql_dml_ice: the pure-SQL DML fixtures — i2 (v2: stacked
    SupportsDelete position deletes + WriteDelta-staged changed-row
    files and their delete file, all under the spec's sequence rule)
    and i3 (v3: puffin deletion-vector UNIONS — a re-delete replaces
    the touched file's DV). The historical surfaces prove old
    snapshots do not see later delete files."""
    failures = []
    engine = {r[0]: (r[1], r[2])
              for r in dump_rows(con, outdir, "q_lake_sql_dml_ice")}
    i2 = os.path.join(root, "db", "i2")
    i3 = os.path.join(root, "db", "i3")
    cur2 = ice_meta(i2)["current-snapshot-id"]
    cur3 = ice_meta(i3)["current-snapshot-id"]
    for tag, base, snap in (("i2_s1", i2, 1), ("i2_s2", i2, 2),
                            ("i2_now", i2, cur2), ("i3_now", i3, cur3)):
        ext = ice_census(con, base, snap)
        if tuple(ext) != tuple(engine[tag]):
            failures.append(
                f"{tag} (snapshot {snap}): external {tuple(ext)} "
                f"vs engine {tuple(engine[tag])}")
    return failures


def check_delta_composed(con, base: str, outdir: str):
    """q_delta_composed: the all-features-on Delta table (column mapping
    mode=name + hive partitioning + row tracking + DVs + clustering)
    read by an INDEPENDENT interpretation: physical column names and
    partition keys come from the log's schemaString mapping metadata,
    DV masks decode through the same z85/frame/roaring path, and the
    row-tracking materialized columns in the files are simply ignored.
    Phases 0..5 totals, phase 6 per-partition under the RENAMED logical
    name, phases 7..8 after metadata-only ADD COLUMN + widening (the
    added column exists in NO file — content must be unchanged)."""
    failures = []
    engine = dump_rows(con, outdir, "q_delta_composed")

    def census(version):
        adds, pcols, schema = delta_state(base, version, with_schema=True)
        fields = json.loads(schema)["fields"]

        def phys(logical):
            for f in fields:
                if f["name"] == logical:
                    return f.get("metadata", {}).get(
                        "delta.columnMapping.physicalName", f["name"])
            return None

        cents_phys = phys("cents") or phys("pennies")
        col_sql = '"' + cents_phys.replace('"', '""') + '"'
        # partitionColumns declares LOGICAL names; partitionValues keys
        # PHYSICAL ones on a mapped table — map through the schema
        part_phys = phys(pcols[0]) if pcols else None
        per_part = {}
        for path, a in adds.items():
            full = os.path.join(base, path)
            dv = a.get("deletionVector")
            if dv:
                masked = dv_positions(base, dv)
                n, c = con.execute(
                    f"SELECT count(*), coalesce(sum({col_sql}), 0) "
                    "FROM read_parquet(?, file_row_number=true) "
                    "WHERE file_row_number NOT IN (SELECT unnest(?::BIGINT[]))",
                    [full, masked]).fetchone()
            else:
                n, c = con.execute(
                    f"SELECT count(*), coalesce(sum({col_sql}), 0) "
                    "FROM read_parquet(?)", [full]).fetchone()
            key = a.get("partitionValues", {}).get(part_phys, "*") if pcols else "*"
            agg = per_part.setdefault(key, [0, 0])
            agg[0] += n
            agg[1] += c
        return sorted((k, n, c) for k, (n, c) in per_part.items())

    for phase in (0, 1, 2, 3, 4, 5, 7, 8):
        version = phase
        ext = census(version)
        n = sum(r[1] for r in ext)
        c = sum(r[2] for r in ext)
        eng = [r for r in engine if r[0] == phase]
        if len(eng) != 1 or (eng[0][2], eng[0][3]) != (n, c):
            failures.append(
                f"composed v{version}: external (n={n}, cents={c}) vs engine {eng}")
    ext6 = census(6)
    eng6 = sorted((r[1], r[2], r[3]) for r in engine if r[0] == 6)
    if eng6 != ext6:
        failures.append(f"composed by-partition: external {ext6} vs engine {eng6}")
    return failures


def check_iceberg_specevo(con, base: str, outdir: str):
    """q_iceberg_spec_evolution: mixed partition-spec manifest planning
    re-derived independently — era-1 manifests (spec-id 0, identity
    o_orderpriority) prune on the priority probe, era-2 manifests
    (spec-id 1, month transform) prune on the month-ordinal window,
    and each phase's PLANNED FILE COUNT and residual-filtered census
    must match the engine dump."""
    failures = []
    engine = {r[0]: (r[1], r[2], r[3]) for r in dump_rows(
        con, outdir, "q_iceberg_spec_evolution")}
    meta = ice_meta(base)
    snap = meta["current-snapshot-id"]
    s_obj = next(x for x in meta["snapshots"] if x["snapshot-id"] == snap)
    month_lo = (1999 - 1970) * 12 + (3 - 1)
    month_hi = (1999 - 1970) * 12 + (6 - 1)

    def plan(era_keep):
        files = []
        for ml in read_avro(ice_resolve(base, s_obj["manifest-list"])):
            spec_id = ml.get("partition_spec_id", 0)
            for e in read_avro(ice_resolve(base, ml["manifest_path"])):
                if e["status"] == 2:
                    continue
                part = e["data_file"].get("partition") or {}
                if era_keep(spec_id, part):
                    files.append(ice_resolve(base, e["data_file"]["file_path"]))
        return sorted(files)

    phases = {
        1: (lambda sid, p: sid != 0 or p.get("o_orderpriority") == "2-HIGH",
            "o_orderpriority = '2-HIGH'"),
        2: (lambda sid, p: sid != 1 or (
                p.get("o_month") is not None and
                month_lo <= p["o_month"] <= month_hi),
            "o_orderdate BETWEEN TIMESTAMP '1999-03-01' AND TIMESTAMP '1999-06-30'"),
        3: (lambda sid, p: True, "TRUE"),
    }
    for phase, (keep, residual) in phases.items():
        files = plan(keep)
        n, c = con.execute(
            "SELECT count(*), coalesce(sum(cents), 0) FROM read_parquet(?) "
            f"WHERE {residual}", [files]).fetchone()
        got = (len(files), n, c)
        if engine.get(phase) != got:
            failures.append(
                f"specevo phase {phase}: external {got} vs engine {engine.get(phase)}")
    return failures


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    sfdir, outdir = sys.argv[1], sys.argv[2]
    h = java_hash_hex(sfdir)
    delta_base = f"/tmp/graft_deltaw_{h}/orders_pdml"
    ice_base = f"/tmp/graft_iceberg_{h}/orders_dml"
    hudi_base = f"/tmp/graft_hudi_{h}/orders_part"
    con = duckdb.connect()
    failures = []
    dv_base = f"/tmp/graft_deltaw_{h}/orders_dv"
    v3_base = f"/tmp/graft_iceberg_{h}/orders_v3dv"
    composed_base = f"/tmp/graft_deltaw_{h}/orders_composed"
    specevo_base = f"/tmp/graft_iceberg_{h}/specevo"
    sqldml_ice_root = f"/tmp/graft_iceberg_{h}/sqldelice"
    for label, base, fn in (("delta", delta_base, check_delta),
                            ("delta-dv", dv_base, check_delta_dv),
                            ("delta-composed", composed_base, check_delta_composed),
                            ("iceberg", ice_base, check_iceberg),
                            ("iceberg-v3-dv", v3_base, check_iceberg_v3),
                            ("iceberg-specevo", specevo_base, check_iceberg_specevo),
                            ("iceberg-sql-dml", sqldml_ice_root, check_iceberg_sql_dml),
                            ("hudi", hudi_base, check_hudi)):
        if not os.path.isdir(base):
            failures.append(f"{label}: fixture {base} missing — run "
                            "graft.Verify on this sfDir first")
            continue
        try:
            fs = fn(con, base, outdir)
        except Exception as e:  # a parse failure IS a conformance failure
            fs = [f"{label}: {type(e).__name__}: {e}"]
        if fs:
            failures += fs
            print(f"FAIL {label} ({base})")
            for f in fs:
                print(f"  {f}")
        else:
            print(f"PASS {label} ({base}) — independent read matches engine")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
