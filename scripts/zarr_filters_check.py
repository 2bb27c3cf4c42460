#!/usr/bin/env python3
"""Independent pure-python pin for the zarr v2 FILTER-chain writer
(save_zarr_filters_roundtrip).

Re-reads the store the gate wrote — json + zlib + struct only, no zarr or
numcodecs library — inverting the numcodecs chain from first principles:
fletcher32 (HDF5 H5_checksum_fletcher32 algorithm, 4-byte LE suffix,
verified not just stripped), shuffle (byte transpose at the dtype width),
delta (wraparound cumsum at the storage width). A disagreement on any byte
of the written chain fails here even if the engine's own reader happens to
share the writer's mistake.

Usage: zarr_filters_check.py [store_dir] [sf_dir]
Defaults match the sf0.01 gate run.
"""
import json, os, struct, sys, zlib

import duckdb


def fletcher32(data):
    """HDF5 H5_checksum_fletcher32: big-endian 16-bit words, deferred
    modulo every 360 words, odd trailing byte as b << 8."""
    sum1 = sum2 = 0
    idx, words = 0, len(data) // 2
    while words > 0:
        tlen = min(words, 360)
        words -= tlen
        for _ in range(tlen):
            sum1 += (data[idx] << 8) | data[idx + 1]
            sum2 += sum1
            idx += 2
        sum1 = (sum1 & 0xFFFF) + (sum1 >> 16)
        sum2 = (sum2 & 0xFFFF) + (sum2 >> 16)
    if len(data) % 2 == 1:
        sum1 += data[-1] << 8
        sum2 += sum1
        sum1 = (sum1 & 0xFFFF) + (sum1 >> 16)
        sum2 = (sum2 & 0xFFFF) + (sum2 >> 16)
    sum1 = (sum1 & 0xFFFF) + (sum1 >> 16)
    sum2 = (sum2 & 0xFFFF) + (sum2 >> 16)
    return (sum2 << 16) | sum1


def unshuffle(raw, width):
    n = len(raw) // width
    out = bytearray(len(raw))
    for p in range(width):
        for e in range(n):
            out[e * width + p] = raw[p * n + e]
    return bytes(out)


WIDTHS = {"<f8": 8, "<i8": 8, "<i4": 4, "<i2": 2, "|i1": 1,
          "|u1": 1, "<u2": 2, "<u4": 4, "<f4": 4}
CODES = {"<f8": "<d", "<i8": "<q", "<i4": "<i", "<i2": "<h", "|i1": "<b",
         "|u1": "<B", "<u2": "<H", "<u4": "<I", "<f4": "<f"}


def read_store_var(store, name):
    with open(os.path.join(store, name, ".zarray")) as f:
        za = json.load(f)
    assert za["zarr_format"] == 2 and za["order"] == "C", za
    dtype = za["dtype"]
    width = WIDTHS[dtype]
    shape, chunks = za["shape"], za["chunks"]
    filters = za.get("filters") or []
    comp = za.get("compressor")
    assert len(shape) == 1 == len(chunks), "1-D fixture expected"
    n_chunks = -(-shape[0] // chunks[0])
    out = {}
    for c in range(n_chunks):
        with open(os.path.join(store, name, str(c)), "rb") as f:
            raw = f.read()
        if comp is not None:
            assert comp["id"] == "zlib", comp
            raw = zlib.decompress(raw)
        # invert the chain in reverse write order
        for spec in reversed(filters):
            fid = spec["id"]
            if fid == "fletcher32":
                stored = struct.unpack("<I", raw[-4:])[0]
                computed = fletcher32(raw[:-4])
                assert computed == stored, (name, c, hex(stored), hex(computed))
                raw = raw[:-4]
            elif fid == "shuffle":
                assert spec.get("elementsize") == width, spec
                raw = unshuffle(raw, width)
            elif fid == "delta":
                assert spec.get("dtype") == dtype, spec
                # applied to typed data: invert AFTER the byte-level ones
                assert spec is filters[0], "delta must be first in the chain"
            else:
                raise AssertionError("unexpected filter %s" % fid)
        vals = list(struct.unpack("%s%d%s" % (CODES[dtype][0], len(raw) // width,
                                              CODES[dtype][1]), raw))
        if filters and filters[0]["id"] == "delta":
            # wraparound cumsum at the storage width
            bits = width * 8
            mask = (1 << bits) - 1
            acc = 0
            decoded = []
            for v in vals:
                acc = (acc + v) & mask
                s = acc - (1 << bits) if dtype[1] == "i" and acc >= (1 << (bits - 1)) else acc
                decoded.append(s)
            vals = decoded
        for j, v in enumerate(vals):
            coord = c * chunks[0] + j
            if coord < shape[0]:  # drop edge padding
                out[coord] = v
    assert len(out) == shape[0], (name, len(out), shape[0])
    return out


def main():
    store = (sys.argv[1] if len(sys.argv) > 1
             else "/tmp/graft_zarr_filt__root_testdata_sf0.01")
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    nk = con.execute(
        "SELECT n_nationkey FROM read_parquet(?) ORDER BY n_nationkey",
        [os.path.join(sf, "nation.parquet")]).fetchall()
    # declared chains land in the metadata
    with open(os.path.join(store, "t_mono", ".zarray")) as f:
        za = json.load(f)
    assert [x["id"] for x in za["filters"]] == ["delta", "shuffle", "fletcher32"], za
    with open(os.path.join(store, "t_wide", ".zarray")) as f:
        za = json.load(f)
    assert [x["id"] for x in za["filters"]] == ["shuffle"], za
    t_mono = read_store_var(store, "t_mono")
    t_wide = read_store_var(store, "t_wide")
    for i, (k,) in enumerate(nk):
        assert t_mono[i] == 1000000 + k * 3, (i, t_mono[i])
        assert t_wide[i] == k * 1000 - 9000, (i, t_wide[i])
    print("zarr_filters_check: OK — %d + %d filtered cells match parquet truth "
          "(delta+shuffle+fletcher32 inverted independently)"
          % (len(t_mono), len(t_wide)))


if __name__ == "__main__":
    main()
