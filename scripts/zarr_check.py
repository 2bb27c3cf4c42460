#!/usr/bin/env python3
"""Independent pure-python pin for the zarr v2 writer (save_zarr_roundtrip).

Reads the store the gate query wrote — json + zlib + struct only, no zarr
library — and compares every decoded cell against the nation/region
parquet the tidy plane was derived from (via duckdb). A disagreement on
any byte of the written format (chunk naming, C-order offsets,
little-endian f8, zlib framing, edge-chunk padding) fails here even if
the engine's own reader happens to share the writer's mistake.

Usage: zarr_check.py [store_dir] [sf_dir]
Defaults match the sf0.01 gate run.
"""
import json, os, struct, sys, zlib

import duckdb


def decode_elems(raw, dtype):
    """Little-endian element decode per the numpy dtype string: f8/i4/i8
    numerics, |S<n> (UTF-8 bytes, NUL-right-trimmed) and <U<n> (UCS-4
    code points, NUL-terminated) fixed-width strings."""
    if dtype == "<f8":
        return struct.unpack("<%dd" % (len(raw) // 8), raw)
    if dtype == "<f4":
        return struct.unpack("<%df" % (len(raw) // 4), raw)
    if dtype == "<i4":
        return struct.unpack("<%di" % (len(raw) // 4), raw)
    if dtype == "<i8":
        return struct.unpack("<%dq" % (len(raw) // 8), raw)
    if dtype == "<i2":
        return struct.unpack("<%dh" % (len(raw) // 2), raw)
    if dtype == "|i1":
        return struct.unpack("<%db" % len(raw), raw)
    if dtype == "|u1":
        return struct.unpack("<%dB" % len(raw), raw)
    if dtype == "<u2":
        return struct.unpack("<%dH" % (len(raw) // 2), raw)
    if dtype == "<u4":
        return struct.unpack("<%dI" % (len(raw) // 4), raw)
    if dtype.startswith("|S"):
        n = int(dtype[2:])
        return tuple(raw[i:i + n].rstrip(b"\0").decode("utf-8")
                     for i in range(0, len(raw), n))
    if dtype.startswith("<U"):
        n = int(dtype[2:])
        out = []
        for i in range(0, len(raw), 4 * n):
            cps = struct.unpack("<%dI" % n, raw[i:i + 4 * n])
            s = ""
            for cp in cps:
                if cp == 0:
                    break
                s += chr(cp)
            out.append(s)
        return tuple(out)
    raise AssertionError("unsupported dtype %s" % dtype)


def read_store_var(store, name):
    with open(os.path.join(store, name, ".zarray")) as f:
        za = json.load(f)
    assert za["zarr_format"] == 2, za
    assert za["order"] == "C", za
    shape, chunks = za["shape"], za["chunks"]
    comp = za.get("compressor")
    n_in = [-(-s // c) for s, c in zip(shape, chunks)]  # chunks per dim
    out = {}
    def rec(idx):
        if len(idx) == len(shape):
            member = ".".join(str(i) for i in idx)
            with open(os.path.join(store, name, member), "rb") as f:
                raw = f.read()
            if comp is not None:
                assert comp["id"] == "zlib", comp
                raw = zlib.decompress(raw)
            vals = decode_elems(raw, za["dtype"])
            # C-order walk of the (padded) chunk
            dims = chunks
            for flat, v in enumerate(vals):
                rem, coord = flat, []
                for d in range(len(dims) - 1, -1, -1):
                    coord.append(idx[d] * dims[d] + rem % dims[d])
                    rem //= dims[d]
                coord = tuple(reversed(coord))
                if all(c < s for c, s in zip(coord, shape)):  # drop padding
                    out[coord] = v
            return
        for i in range(n_in[len(idx)]):
            rec(idx + [i])
    rec([])
    expected = 1
    for s in shape:
        expected *= s
    assert len(out) == expected, (name, len(out), expected)
    return out


def main():
    store = (sys.argv[1] if len(sys.argv) > 1
             else "/tmp/graft_zarr_rt__root_testdata_sf0.01")
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    nk = con.execute(
        "SELECT n_nationkey FROM read_parquet(?) ORDER BY n_nationkey",
        [os.path.join(sf, "nation.parquet")]).fetchall()
    rk = con.execute(
        "SELECT r_regionkey FROM read_parquet(?) ORDER BY r_regionkey",
        [os.path.join(sf, "region.parquet")]).fetchall()
    n_key = read_store_var(store, "n_key")
    assert len(n_key) == len(nk), (len(n_key), len(nk))
    for i, (k,) in enumerate(nk):
        assert n_key[(i,)] == float(k), (i, n_key[(i,)], k)
    key_sum = read_store_var(store, "key_sum")
    assert len(key_sum) == len(nk) * len(rk)
    for i, (k,) in enumerate(nk):
        for j, (r,) in enumerate(rk):
            assert key_sum[(i, j)] == float(k + r), (i, j, key_sum[(i, j)], k + r)
    # dimension names round-trip too
    with open(os.path.join(store, "key_sum", ".zattrs")) as f:
        assert json.load(f)["_ARRAY_DIMENSIONS"] == ["nation", "region"]
    # r12 dtype breadth: <i4, <i8 (beyond int range), |S and <U labels
    names = con.execute(
        "SELECT n_regionkey, n_name FROM read_parquet(?) ORDER BY n_nationkey",
        [os.path.join(sf, "nation.parquet")]).fetchall()
    rnames = con.execute(
        "SELECT r_name FROM read_parquet(?) ORDER BY r_regionkey",
        [os.path.join(sf, "region.parquet")]).fetchall()
    n_region = read_store_var(store, "n_region")
    n_big = read_store_var(store, "n_big")
    n_name = read_store_var(store, "n_name")
    r_label = read_store_var(store, "r_label")
    with open(os.path.join(store, "n_region", ".zarray")) as f:
        assert json.load(f)["dtype"] == "<i4"
    with open(os.path.join(store, "n_big", ".zarray")) as f:
        assert json.load(f)["dtype"] == "<i8"
    with open(os.path.join(store, "n_name", ".zarray")) as f:
        assert json.load(f)["dtype"].startswith("|S")
    with open(os.path.join(store, "r_label", ".zarray")) as f:
        assert json.load(f)["dtype"].startswith("<U")
    for i, (rgk, nm) in enumerate(names):
        assert n_region[(i,)] == rgk, (i, n_region[(i,)], rgk)
        assert n_big[(i,)] == 10000000000 + nk[i][0], (i, n_big[(i,)])
        assert n_name[(i,)] == nm, (i, n_name[(i,)], nm)
    for j, (rn,) in enumerate(rnames):
        assert r_label[(j,)] == rn, (j, r_label[(j,)], rn)
    # r13 read-side dtype parity: f4 half-steps, signed i2/i1 negatives,
    # and the unsigned ladder at the widths where a signed decode would
    # corrupt (u2 beyond i2's max, u4 beyond i4's max)
    parity = {"n_f4": ("<f4", lambda k: k * 0.5),
              "n_i2": ("<i2", lambda k: k * 100 - 500),
              "n_i1": ("|i1", lambda k: k * 10 - 120),
              "n_u1": ("|u1", lambda k: k * 10),
              "n_u2": ("<u2", lambda k: k * 2000),
              "n_u4": ("<u4", lambda k: 4000000000 + k)}
    n_parity = 0
    for name, (want_dt, f) in sorted(parity.items()):
        with open(os.path.join(store, name, ".zarray")) as fh:
            assert json.load(fh)["dtype"] == want_dt, name
        cells = read_store_var(store, name)
        assert len(cells) == len(nk), (name, len(cells))
        for i, (k,) in enumerate(nk):
            assert cells[(i,)] == f(k), (name, i, cells[(i,)], f(k))
        n_parity += len(cells)
    print("zarr_check: OK — %d + %d + %d + %d + %d + %d (+%d parity) cells match parquet truth"
          % (len(n_key), len(key_sum), len(n_region), len(n_big),
             len(n_name), len(r_label), n_parity))


if __name__ == "__main__":
    main()
