#!/usr/bin/env python3
"""Independent pure-python pin for the zarr v3 sharded writer
(save_zarr_v3_roundtrip).

Reads the store the gate query wrote — json + gzip + struct only, no zarr
library — and compares every decoded cell against the nation/region
parquet the tidy plane was derived from (via duckdb). The shard framing
is walked from first principles: trailing 16-byte-per-slot little-endian
index, all-ones absent sentinel, and a CRC32C (Castagnoli polynomial,
implemented here — zlib.crc32 is the WRONG polynomial) verified over the
index bytes. A disagreement on any byte of the written format fails here
even if the engine's own reader happens to share the writer's mistake.

Usage: zarr3_check.py [store_dir] [sf_dir]
Defaults match the sf0.01 gate run.
"""
import gzip, json, os, struct, sys

import duckdb

# CRC32C (Castagnoli), reflected polynomial 0x82F63B78 — table-driven.
_TBL = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _TBL.append(_c)


def crc32c(data):
    c = 0xFFFFFFFF
    for b in data:
        c = _TBL[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


def element_width(data_type):
    """Bytes per element: core numerics, or r{N} raw bits (the writer's
    |S label representation — core v3 has no fixed-width string type)."""
    if data_type == "float64" or data_type == "int64":
        return 8
    if data_type in ("int32", "uint32", "float32"):
        return 4
    if data_type in ("int16", "uint16"):
        return 2
    if data_type in ("int8", "uint8"):
        return 1
    if data_type.startswith("r"):
        bits = int(data_type[1:])
        assert bits > 0 and bits % 8 == 0, data_type
        return bits // 8
    raise AssertionError("unsupported data_type %s" % data_type)


def decode_inner(raw, codecs, data_type, n_elems):
    names = [c["name"] for c in codecs]
    assert names[0] == "bytes", codecs
    assert codecs[0].get("configuration", {}).get("endian", "little") == "little"
    if "gzip" in names:
        raw = gzip.decompress(raw)
    if "zstd" in names:
        # pyarrow bundles a zstd decoder; the frame carries no trusted size,
        # so pass the exact payload size the geometry dictates
        import pyarrow
        raw = pyarrow.Codec("zstd").decompress(
            raw, element_width(data_type) * n_elems, asbytes=True)
    w = element_width(data_type)
    assert len(raw) == w * n_elems, (len(raw), w, n_elems)
    if data_type == "float64":
        return struct.unpack("<%dd" % n_elems, raw)
    if data_type == "float32":
        return struct.unpack("<%df" % n_elems, raw)
    if data_type == "int32":
        return struct.unpack("<%di" % n_elems, raw)
    if data_type == "int64":
        return struct.unpack("<%dq" % n_elems, raw)
    if data_type == "int16":
        return struct.unpack("<%dh" % n_elems, raw)
    if data_type == "int8":
        return struct.unpack("<%db" % n_elems, raw)
    if data_type == "uint8":
        return struct.unpack("<%dB" % n_elems, raw)
    if data_type == "uint16":
        return struct.unpack("<%dH" % n_elems, raw)
    if data_type == "uint32":
        return struct.unpack("<%dI" % n_elems, raw)
    # r{8n}: NUL-right-trimmed UTF-8 byte strings (the writer's convention)
    return tuple(raw[i:i + w].rstrip(b"\0").decode("utf-8")
                 for i in range(0, len(raw), w))


def read_store_var(store, name):
    with open(os.path.join(store, name, "zarr.json")) as f:
        zj = json.load(f)
    assert zj["zarr_format"] == 3 and zj["node_type"] == "array", zj
    data_type = zj["data_type"]
    assert zj["chunk_grid"]["name"] == "regular", zj
    cke = zj["chunk_key_encoding"]
    assert cke["name"] == "default" and cke["configuration"]["separator"] == "/"
    shape = zj["shape"]
    grid = zj["chunk_grid"]["configuration"]["chunk_shape"]
    codecs = zj["codecs"]
    if codecs[0]["name"] == "sharding_indexed":
        cfg = codecs[0]["configuration"]
        inner = cfg["chunk_shape"]
        inner_codecs = cfg["codecs"]
        assert cfg.get("index_location", "end") == "end", cfg
        idx_names = [c["name"] for c in cfg.get(
            "index_codecs", [{"name": "bytes"}, {"name": "crc32c"}])]
        assert idx_names == ["bytes", "crc32c"], idx_names
    else:
        inner, inner_codecs = grid, codecs
    per_shard = [g // i for g, i in zip(grid, inner)]
    slots = 1
    for p in per_shard:
        slots *= p
    n_outer = [-(-s // g) for s, g in zip(shape, grid)]
    out = {}

    def add_chunk(vals, inner_idx):
        # C-order walk of the (padded) inner chunk; drop out-of-shape pads
        for flat, v in enumerate(vals):
            rem, coord = flat, []
            for d in range(len(inner) - 1, -1, -1):
                coord.append(inner_idx[d] * inner[d] + rem % inner[d])
                rem //= inner[d]
            coord = tuple(reversed(coord))
            if all(c < s for c, s in zip(coord, shape)):
                out[coord] = v

    def walk(idx):
        if len(idx) < len(shape):
            for i in range(n_outer[len(idx)]):
                walk(idx + [i])
            return
        path = os.path.join(store, name, "c", *[str(i) for i in idx])
        if not os.path.exists(path):
            return  # wholly absent object = fill everywhere
        with open(path, "rb") as f:
            blob = f.read()
        n_elems = 1
        for c in inner:
            n_elems *= c
        if codecs[0]["name"] != "sharding_indexed":
            add_chunk(decode_inner(blob, inner_codecs, data_type, n_elems), idx)
            return
        ilen = 16 * slots + 4
        index, crc = blob[-ilen:-4], blob[-4:]
        assert struct.unpack("<I", crc)[0] == crc32c(index), "index crc32c"
        for slot in range(slots):
            off, nb = struct.unpack_from("<qq", index, slot * 16)
            if off == -1 and nb == -1:
                continue  # absent inner chunk = fill
            # slot → inner grid coords (C-order), then global inner index
            rem, ic = slot, []
            for d in range(len(per_shard) - 1, -1, -1):
                ic.append(rem % per_shard[d])
                rem //= per_shard[d]
            ic = list(reversed(ic))
            gidx = [idx[d] * per_shard[d] + ic[d] for d in range(len(idx))]
            add_chunk(decode_inner(blob[off:off + nb], inner_codecs,
                                   data_type, n_elems), gidx)

    walk([])
    return out, zj.get("dimension_names")


def main():
    store = (sys.argv[1] if len(sys.argv) > 1
             else "/tmp/graft_zarr3_rt__root_testdata_sf0.01")
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    with open(os.path.join(store, "zarr.json")) as f:
        root = json.load(f)
    assert root["zarr_format"] == 3 and root["node_type"] == "group", root
    con = duckdb.connect()
    nk = con.execute(
        "SELECT n_nationkey FROM read_parquet(?) ORDER BY n_nationkey",
        [os.path.join(sf, "nation.parquet")]).fetchall()
    rk = con.execute(
        "SELECT r_regionkey FROM read_parquet(?) ORDER BY r_regionkey",
        [os.path.join(sf, "region.parquet")]).fetchall()
    n_key, dn1 = read_store_var(store, "n_key")
    assert dn1 == ["nation"], dn1
    assert len(n_key) == len(nk), (len(n_key), len(nk))
    for i, (k,) in enumerate(nk):
        assert n_key[(i,)] == float(k), (i, n_key[(i,)], k)
    key_sum, dn2 = read_store_var(store, "key_sum")
    assert dn2 == ["nation", "region"], dn2
    assert len(key_sum) == len(nk) * len(rk)
    for i, (k,) in enumerate(nk):
        for j, (r,) in enumerate(rk):
            assert key_sum[(i, j)] == float(k + r), (i, j, key_sum[(i, j)], k + r)
    # r12 dtype breadth: int32, int64 (beyond int range), r{8n} labels
    # (the writer's |S-over-raw-bits convention), all under the zstd codec
    names = con.execute(
        "SELECT n_regionkey, n_name FROM read_parquet(?) ORDER BY n_nationkey",
        [os.path.join(sf, "nation.parquet")]).fetchall()
    rnames = con.execute(
        "SELECT r_name FROM read_parquet(?) ORDER BY r_regionkey",
        [os.path.join(sf, "region.parquet")]).fetchall()
    def dt(name):
        with open(os.path.join(store, name, "zarr.json")) as f:
            return json.load(f)["data_type"]
    assert dt("n_region") == "int32", dt("n_region")
    assert dt("n_big") == "int64", dt("n_big")
    assert dt("n_name").startswith("r"), dt("n_name")
    assert dt("r_label").startswith("r"), dt("r_label")
    n_region, _ = read_store_var(store, "n_region")
    n_big, _ = read_store_var(store, "n_big")
    n_name, _ = read_store_var(store, "n_name")
    r_label, _ = read_store_var(store, "r_label")
    for i, (rgk, nm) in enumerate(names):
        assert n_region[(i,)] == rgk, (i, n_region[(i,)], rgk)
        assert n_big[(i,)] == 10000000000 + nk[i][0], (i, n_big[(i,)])
        assert n_name[(i,)] == nm, (i, n_name[(i,)], nm)
    for j, (rn,) in enumerate(rnames):
        assert r_label[(j,)] == rn, (j, r_label[(j,)], rn)
    # r14: fill_value is REQUIRED by v3 core; r* arrays carry the spec's
    # raw-bits form — an array of N/8 byte integers, all zero (the pad
    # byte); numeric arrays must still carry their scalar fill
    def zj(name):
        with open(os.path.join(store, name, "zarr.json")) as f:
            return json.load(f)
    def rwidth(name):
        dt = zj(name)["data_type"]
        assert dt.startswith("r") and int(dt[1:]) % 8 == 0, dt
        return int(dt[1:]) // 8
    assert zj("n_name")["fill_value"] == [0] * rwidth("n_name"), zj("n_name")
    assert zj("r_label")["fill_value"] == [0] * rwidth("r_label"), zj("r_label")
    assert zj("n_key")["fill_value"] == 0.0
    assert zj("n_region")["fill_value"] == 0
    # r13 read-side dtype parity: f4 half-steps, signed i2/i1 negatives,
    # and the unsigned ladder at the widths where a signed decode would
    # corrupt (u2 beyond i2's max, u4 beyond i4's max)
    parity = {"n_f4": ("float32", lambda k: k * 0.5),
              "n_i2": ("int16", lambda k: k * 100 - 500),
              "n_i1": ("int8", lambda k: k * 10 - 120),
              "n_u1": ("uint8", lambda k: k * 10),
              "n_u2": ("uint16", lambda k: k * 2000),
              "n_u4": ("uint32", lambda k: 4000000000 + k)}
    n_parity = 0
    for name, (want_dt, f) in sorted(parity.items()):
        assert dt(name) == want_dt, (name, dt(name))
        cells, _ = read_store_var(store, name)
        assert len(cells) == len(nk), (name, len(cells))
        for i, (k,) in enumerate(nk):
            assert cells[(i,)] == f(k), (name, i, cells[(i,)], f(k))
        n_parity += len(cells)
    print("zarr3_check: OK — %d + %d + %d + %d + %d + %d (+%d parity) cells match "
          "parquet truth (sharded v3, zstd)"
          % (len(n_key), len(key_sum), len(n_region), len(n_big),
             len(n_name), len(r_label), n_parity))


if __name__ == "__main__":
    main()
