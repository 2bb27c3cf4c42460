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


def lz4_block_decompress(src, dst_size):
    """LZ4 BLOCK format (public spec): token = (litlen<<4)|matchlen-4,
    255-continued lengths, 2-byte LE match offset. Pure python — the pin
    must not share code with the writer's encoder."""
    dst = bytearray()
    i = 0
    while i < len(src):
        token = src[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = src[i]
                i += 1
                lit += b
                if b != 255:
                    break
        dst += src[i:i + lit]
        i += lit
        if i >= len(src):
            break  # final literals-only sequence
        off = src[i] | (src[i + 1] << 8)
        i += 2
        assert off > 0, "LZ4 match offset 0"
        mlen = token & 0xF
        if mlen == 15:
            while True:
                b = src[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        mlen += 4
        start = len(dst) - off
        for k in range(mlen):  # byte-wise: overlapping matches replicate
            dst.append(dst[start + k])
    assert len(dst) == dst_size, (len(dst), dst_size)
    return bytes(dst)


def blosc_unshuffle(b, typesize):
    """Inverse byte-shuffle: plane-major → element-major; trailing
    len % typesize bytes carried verbatim (c-blosc's rule)."""
    n = len(b)
    elems = n // typesize
    main = elems * typesize
    out = bytearray(n)
    for p in range(typesize):
        out[p:main:typesize] = b[p * elems:(p + 1) * elems]
    out[main:] = b[main:]
    return bytes(out)


def blosc_decompress(src):
    """blosc1 chunk (c-blosc 1.x format): 16-byte header (version,
    versionlz, flags, typesize, nbytes/blocksize/cbytes LE32), uint32-LE
    block starts, per block nsplits streams of [int32-LE size][data];
    a stream of exactly the split size is stored raw. Split rule (lz4):
    typesize splits when 1 < typesize <= 16 and blocksize/typesize >= 128
    and the block is not the trailing partial one."""
    flags, typesize = src[2], src[3]
    nbytes, blocksize, cbytes = struct.unpack_from("<III", src, 4)
    assert cbytes == len(src), (cbytes, len(src))
    if flags & 0x2:  # memcpy chunk
        assert cbytes == 16 + nbytes
        return src[16:16 + nbytes]
    codec = flags >> 5
    assert codec == 1, "expected lz4 blosc chunks from the writer, id %d" % codec
    assert not (flags & 0x4), "unexpected bit-shuffle from the writer"
    nblocks = max(1, -(-nbytes // blocksize))
    bstarts = struct.unpack_from("<%dI" % nblocks, src, 16)
    out = bytearray()
    for j in range(nblocks):
        bsize = min(blocksize, nbytes - j * blocksize)
        leftover = bsize != blocksize
        nsplits = (typesize if (1 < typesize <= 16
                                and blocksize // typesize >= 128
                                and not leftover) else 1)
        neblock = bsize // nsplits
        pos = bstarts[j]
        block = bytearray()
        for _ in range(nsplits):
            csize = struct.unpack_from("<i", src, pos)[0]
            pos += 4
            if csize == neblock:  # stored split
                block += src[pos:pos + neblock]
            else:
                block += lz4_block_decompress(src[pos:pos + csize], neblock)
            pos += csize
        if flags & 0x1:
            block = blosc_unshuffle(bytes(block), typesize)
        out += block
    assert len(out) == nbytes, (len(out), nbytes)
    return bytes(out)


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
    if "blosc" in names:
        cfg = [c for c in codecs if c["name"] == "blosc"][0]["configuration"]
        assert cfg["cname"] == "lz4", cfg
        # metadata must agree with the writer's element-width rule
        w = element_width(data_type)
        want_ts = w if w <= 255 else 1
        assert cfg["typesize"] == want_ts, (cfg, w)
        assert cfg["shuffle"] == ("shuffle" if want_ts > 1 else "noshuffle"), cfg
        raw = blosc_decompress(raw)
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
    # r14: the BLOSC arm (save_zarr_v3_blosc) — same tidy plane written
    # unsharded with bytes+blosc chains; re-decode EVERY variable with the
    # independent blosc1/LZ4/unshuffle walk above and compare cell-for-cell
    # against the zstd store already proven against parquet truth
    bstore = (sys.argv[3] if len(sys.argv) > 3
              else "/tmp/graft_zarr3_blosc__root_testdata_sf0.01")
    n_blosc = 0
    if os.path.isdir(bstore):
        for name in sorted(os.listdir(store)):
            if not os.path.isdir(os.path.join(store, name)):
                continue
            with open(os.path.join(bstore, name, "zarr.json")) as f:
                bz = json.load(f)
            chain = [c["name"] for c in bz["codecs"]]
            assert chain == ["bytes", "blosc"], (name, chain)
            bcells, bdims = read_store_var(bstore, name)
            zcells, zdims = read_store_var(store, name)
            assert bdims == zdims, (name, bdims, zdims)
            assert bcells == zcells, (name, len(bcells), len(zcells))
            n_blosc += len(bcells)
        assert n_blosc > 0
    print("zarr3_check: OK — %d + %d + %d + %d + %d + %d (+%d parity) cells match "
          "parquet truth (sharded v3, zstd); blosc arm: %s"
          % (len(n_key), len(key_sum), len(n_region), len(n_big),
             len(n_name), len(r_label), n_parity,
             ("%d cells re-decoded via python blosc1+lz4" % n_blosc)
             if n_blosc else "store absent, skipped"))


if __name__ == "__main__":
    main()
