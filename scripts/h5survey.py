"""Minimal pure-python HDF5 reader for surveying/oracling netCDF-4 samples.

Implements the subset of the public HDF5 File Format Specification (v3.0,
https://docs.hdfgroup.org/hdf5/develop/_f_m_t3.html) that netCDF-4 writers
emit: superblock v0/v2/v3, object headers v1/v2, dense + compact links
(fractal heap, v2 B-tree), dense + compact attributes, dataspace v1/v2,
datatype classes 0/1/3, layout contiguous/chunked (v1 B-tree and v4 chunk
indexes), filter pipeline v1/v2 (deflate, shuffle, fletcher32).

Driver-side only (not shipped in the library); used to scope the Scala
implementation and to derive independent oracle values.
"""
import struct, sys, collections, zlib

UNDEF = 0xFFFFFFFFFFFFFFFF


class H5(object):
    def __init__(self, path):
        self.b = open(path, 'rb').read()
        assert self.b[:8] == b'\x89HDF\r\n\x1a\n'
        self.feat = collections.Counter()
        v = self.b[8]
        self.sbver = v
        self.feat['superblock_v%d' % v] += 1
        if v < 2:
            self.so, self.sl = self.b[13], self.b[14]
            self.root_ohdr = None
            self.root_ste = 24 + 4 * 8
        else:
            self.so, self.sl = self.b[9], self.b[10]
            self.root_ohdr = self.u(12 + 3 * 8, 8)
        assert (self.so, self.sl) == (8, 8), (self.so, self.sl)

    def u(self, off, n):
        return int.from_bytes(self.b[off:off + n], 'little')

    # ---------- object headers ----------

    def msgs(self, addr):
        if self.b[addr:addr + 4] == b'OHDR':
            return self.msgs_v2(addr)
        return self.msgs_v1(addr)

    def msgs_v1(self, addr):
        ver = self.b[addr]
        assert ver == 1, ver
        self.feat['ohdr_v1'] += 1
        nmsg = self.u(addr + 2, 2)
        hdr_size = self.u(addr + 8, 4)
        out = []
        blocks = [(addr + 16, hdr_size)]
        got = 0
        while blocks and got < nmsg:
            off, size = blocks.pop(0)
            p = off
            while p + 8 <= off + size and got < nmsg:
                mtype = self.u(p, 2)
                msize = self.u(p + 2, 2)
                body = p + 8
                if mtype == 0x10:
                    blocks.append((self.u(body, 8), self.u(body + 8, 8)))
                out.append((mtype, body, msize))
                got += 1
                p = body + msize
        return out

    def msgs_v2(self, addr):
        assert self.b[addr:addr + 4] == b'OHDR'
        self.feat['ohdr_v2'] += 1
        flags = self.b[addr + 5]
        p = addr + 6
        if flags & 0x20:
            p += 16
        if flags & 0x10:
            p += 4
        szlen = 1 << (flags & 0x3)
        size0 = self.u(p, szlen)
        p += szlen
        track = bool(flags & 0x04)
        out = []
        blocks = [(p, size0)]
        while blocks:
            off, size = blocks.pop(0)
            q = off
            end = off + size
            hdr = 4 + (2 if track else 0)
            while end - q >= hdr:
                mtype = self.b[q]
                msize = self.u(q + 1, 2)
                q += 4
                if track:
                    q += 2
                body = q
                if mtype == 0x10:
                    ca, cl = self.u(body, 8), self.u(body + 8, 8)
                    assert self.b[ca:ca + 4] == b'OCHK'
                    blocks.append((ca + 4, cl - 8))
                out.append((mtype, body, msize))
                q = body + msize
        return out

    # ---------- old-style groups (symbol table) ----------

    def ste(self, off):
        return dict(lno=self.u(off, 8), ohdr=self.u(off + 8, 8),
                    ct=self.u(off + 16, 4), scratch=self.b[off + 24:off + 40])

    def local_heap_data(self, off):
        assert self.b[off:off + 4] == b'HEAP'
        return self.u(off + 8 + 8 + 8, 8)

    def heap_str(self, heap_data, off):
        end = self.b.index(b'\0', heap_data + off)
        return self.b[heap_data + off:end].decode()

    def symtab_links(self, btree_addr, heap_addr):
        heap_data = self.local_heap_data(heap_addr)
        out = []

        def walk(addr):
            assert self.b[addr:addr + 4] == b'TREE'
            ntype, nlevel = self.b[addr + 4], self.b[addr + 5]
            nent = self.u(addr + 6, 2)
            assert ntype == 0
            p = addr + 24 + 8
            for _ in range(nent):
                child = self.u(p, 8)
                p += 16
                if nlevel > 0:
                    walk(child)
                else:
                    assert self.b[child:child + 4] == b'SNOD'
                    nsym = self.u(child + 6, 2)
                    q = child + 8
                    for _ in range(nsym):
                        e = self.ste(q)
                        q += 40
                        out.append((self.heap_str(heap_data, e['lno']), e['ohdr']))
        walk(btree_addr)
        self.feat['group_symtab'] += 1
        return out

    # ---------- fractal heap ----------

    def fractal_heap(self, addr):
        b = self.b
        assert b[addr:addr + 4] == b'FRHP', b[addr:addr + 4]
        hid_len = self.u(addr + 5, 2)
        io_filter_len = self.u(addr + 7, 2)
        assert io_filter_len == 0, io_filter_len
        flags = b[addr + 9]
        p = addr + 10
        max_managed = self.u(p, 4); p += 4
        p += 8              # next huge id
        huge_bt = self.u(p, 8); p += 8
        p += 8 * 4          # free space, fs mgr, managed space, alloc iter
        p += 8 * 3          # managed offset, managed nobj, huge size
        p += 8 * 3          # huge nobj, tiny size, tiny nobj
        width = self.u(p, 2); p += 2
        start_bs = self.u(p, 8); p += 8
        max_dbs = self.u(p, 8); p += 8
        max_heap_bits = self.u(p, 2); p += 2
        p += 2              # starting # rows
        root_addr = self.u(p, 8); p += 8
        cur_rows = self.u(p, 2); p += 2
        off_sz = (max_heap_bits + 7) // 8
        len_sz = min_bytes(max_managed)  # length field sized by max managed object size
        checksum_data = bool(flags & 0x02)
        max_db_rows = (max_dbs.bit_length() - start_bs.bit_length()) + 2
        heap = dict(width=width, start_bs=start_bs, max_dbs=max_dbs,
                    off_sz=off_sz, len_sz=len_sz, hid_len=hid_len,
                    checksum=checksum_data, max_db_rows=max_db_rows,
                    blocks={})

        def row_size(row):
            return start_bs if row < 2 else start_bs << (row - 1)

        def read_direct(daddr, block_off, size):
            assert b[daddr:daddr + 4] == b'FHDB', b[daddr:daddr + 4]
            heap['blocks'][block_off] = (daddr, size)

        def read_indirect(iaddr, block_off, nrows):
            assert b[iaddr:iaddr + 4] == b'FHIB', b[iaddr:iaddr + 4]
            q = iaddr + 5 + 8 + off_sz
            off = block_off
            for row in range(nrows):
                rs = row_size(row)
                for _ in range(width):
                    if row < max_db_rows:
                        child = self.u(q, 8)
                        q += 8
                        if child != UNDEF:
                            read_direct(child, off, rs)
                    else:
                        child = self.u(q, 8)
                        q += 8
                        if child != UNDEF:
                            # nested indirect block; rows derived from rs
                            sub_rows = (rs.bit_length() - start_bs.bit_length()) + 1
                            read_indirect(child, off, sub_rows)
                    off += rs

        if root_addr != UNDEF:
            if cur_rows == 0:
                read_direct(root_addr, 0, start_bs)
                self.feat['fheap_root_direct'] += 1
            else:
                read_indirect(root_addr, 0, cur_rows)
                self.feat['fheap_root_indirect_rows%d' % cur_rows] += 1

        def get(heap_id):
            ver_type = heap_id[0]
            idtype = (ver_type >> 4) & 0x3
            if idtype == 1:  # huge: ID into the huge-object v2 btree
                self.feat['heapid_huge'] += 1
                want = int.from_bytes(heap_id[1:hid_len], 'little')
                rt, recs = self.btree2_records(huge_bt)
                assert rt in (1, 2), rt  # indirect huge, non-filtered/filtered
                assert rt == 1, 'filtered huge object'
                for r in recs:
                    a = int.from_bytes(r[0:8], 'little')
                    ln = int.from_bytes(r[8:16], 'little')
                    hid = int.from_bytes(r[16:24], 'little')
                    if hid == want:
                        return self.b[a:a + ln]
                raise AssertionError('huge id %d not found' % want)
            if idtype == 2:  # tiny: payload inline in the id
                self.feat['heapid_tiny'] += 1
                ln = (ver_type & 0x0F) + 1
                return heap_id[1:1 + ln]
            assert idtype == 0, 'unknown heap id type'
            off = int.from_bytes(heap_id[1:1 + off_sz], 'little')
            ln = int.from_bytes(heap_id[1 + off_sz:1 + off_sz + len_sz], 'little')
            # locate containing direct block
            for boff in sorted(heap['blocks']):
                daddr, bsize = heap['blocks'][boff]
                if boff <= off < boff + bsize:
                    return self.b[daddr + (off - boff):daddr + (off - boff) + ln]
            raise AssertionError('heap offset %d not in any block' % off)
        heap['get'] = get
        return heap

    # ---------- v2 btree ----------

    def btree2_records(self, addr):
        b = self.b
        assert b[addr:addr + 4] == b'BTHD', b[addr:addr + 4]
        rtype = b[addr + 5]
        node_size = self.u(addr + 6, 4)
        rec_size = self.u(addr + 10, 2)
        depth = self.u(addr + 12, 2)
        root = self.u(addr + 16, 8)
        root_nrec = self.u(addr + 24, 2)
        total_nrec = self.u(addr + 26, 8)
        self.feat['btree2_t%d_d%d' % (rtype, depth)] += 1
        out = []
        if root == UNDEF or (root_nrec == 0 and total_nrec == 0):
            return rtype, out

        # sizes for internal-node child pointers
        def max_nrec(sz, d):
            # leaf: (sz - 10) // rec_size ; internal subtract pointer sizes
            if d == 0:
                return (sz - 10) // rec_size
            below = max_nrec(sz, d - 1)
            tot_below = total_max(d - 1)
            ptr = 8 + min_bytes(below) + (min_bytes(tot_below) if d > 1 else 0)
            return (sz - 10 - ptr) // (rec_size + ptr)

        def total_max(d):
            if d == 0:
                return max_nrec(node_size, 0)
            n = max_nrec(node_size, d)
            return n + (n + 1) * total_max(d - 1)

        def walk(naddr, nrec, d):
            sig = b[naddr:naddr + 4]
            if d == 0:
                assert sig == b'BTLF', sig
                p = naddr + 6
                for _ in range(nrec):
                    out.append(b[p:p + rec_size])
                    p += rec_size
            else:
                assert sig == b'BTIN', sig
                p = naddr + 6
                recs = [b[p + i * rec_size:p + (i + 1) * rec_size] for i in range(nrec)]
                p += nrec * rec_size
                nb = min_bytes(max_nrec(node_size, d - 1))
                tb = min_bytes(total_max(d - 1)) if d > 1 else 0
                for i in range(nrec + 1):
                    child = self.u(p, 8)
                    p += 8
                    cn = int.from_bytes(b[p:p + nb], 'little')
                    p += nb + tb
                    walk(child, cn, d - 1)
                    if i < nrec:
                        out.append(recs[i])
        walk(root, root_nrec, depth)
        return rtype, out

    # ---------- dense/compact links and attributes ----------

    def group_links(self, ms):
        """All (name, ohdr_addr) links of a group given its header messages."""
        links = []
        for t, o, sz in ms:
            if t == 0x06:
                links.append(self.parse_link(self.b[o:o + sz]))
                self.feat['link_compact'] += 1
            elif t == 0x11:
                links += self.symtab_links(self.u(o, 8), self.u(o + 8, 8))
            elif t == 0x02:
                flags = self.b[o + 1]
                p = o + 2
                if flags & 1:
                    p += 8
                fheap = self.u(p, 8)
                nameidx = self.u(p + 8, 8)
                if fheap != UNDEF:
                    self.feat['link_dense'] += 1
                    heap = self.fractal_heap(fheap)
                    rt, recs = self.btree2_records(nameidx)
                    assert rt == 5, rt
                    for r in recs:
                        # type 5: hash(4) + heap id(7)
                        links.append(self.parse_link(heap['get'](r[4:4 + 7])))
        return [l for l in links if l]

    def parse_link(self, m):
        ver, flags = m[0], m[1]
        assert ver == 1
        p = 2
        ltype = 0
        if flags & 0x08:
            ltype = m[p]; p += 1
        if flags & 0x04:
            p += 8
        if flags & 0x10:
            p += 1
        lsz = 1 << (flags & 0x3)
        nlen = int.from_bytes(m[p:p + lsz], 'little')
        p += lsz
        name = m[p:p + nlen].decode()
        p += nlen
        if ltype == 0:
            return (name, int.from_bytes(m[p:p + 8], 'little'))
        self.feat['link_type%d' % ltype] += 1
        return None

    def attributes(self, ms):
        out = []
        for t, o, sz in ms:
            if t == 0x0C:
                out.append(self.parse_attr(o))
            elif t == 0x15:
                flags = self.b[o + 1]
                p = o + 2
                if flags & 1:
                    p += 2
                fheap = self.u(p, 8)
                nameidx = self.u(p + 8, 8)
                if fheap != UNDEF:
                    self.feat['attr_dense'] += 1
                    heap = self.fractal_heap(fheap)
                    rt, recs = self.btree2_records(nameidx)
                    assert rt == 8, rt
                    for r in recs:
                        # type 8: heap id(8) + flags(1) + corder(4) + hash(4)
                        hid = r[0:8]
                        out.append(self.parse_attr_bytes(heap['get'](hid)))
        return out

    def parse_attr(self, off):
        return self.parse_attr_bytes(self.b[off:])

    def parse_attr_bytes(self, m):
        ver = m[0]
        if ver == 1:
            nsz = int.from_bytes(m[2:4], 'little')
            dsz = int.from_bytes(m[4:6], 'little')
            ssz = int.from_bytes(m[6:8], 'little')
            p = 8
            name = m[p:p + nsz].split(b'\0')[0].decode()
            p += (nsz + 7) & ~7
            tinfo = self.datatype_bytes(m[p:p + dsz])
            p += (dsz + 7) & ~7
            sp = self.dataspace_bytes(m[p:p + ssz])
            p += (ssz + 7) & ~7
        else:
            assert ver in (2, 3), ver
            flags = m[1]
            nsz = int.from_bytes(m[2:4], 'little')
            dsz = int.from_bytes(m[4:6], 'little')
            ssz = int.from_bytes(m[6:8], 'little')
            p = 8
            if ver == 3:
                p += 1
            name = m[p:p + nsz].split(b'\0')[0].decode()
            p += nsz
            tinfo = self.datatype_bytes(m[p:p + dsz])
            p += dsz
            sp = self.dataspace_bytes(m[p:p + ssz])
            p += ssz
        self.feat['attr_v%d' % ver] += 1
        n = 1
        for d in sp[0]:
            n *= d
        val = self.decode_values(tinfo, m[p:p + n * tinfo['size']], n)
        return (name, val)

    # ---------- dataspace / datatype ----------

    def dataspace_bytes(self, m):
        ver = m[0]
        rank = m[1]
        self.feat['dataspace_v%d' % ver] += 1
        if ver == 1:
            flags = m[2]
            p = 8
        else:
            assert ver == 2, ver
            flags = m[2]
            p = 4
        dims = [int.from_bytes(m[p + 8 * i:p + 8 * i + 8], 'little') for i in range(rank)]
        maxdims = None
        if flags & 1:
            q = p + 8 * rank
            maxdims = [int.from_bytes(m[q + 8 * i:q + 8 * i + 8], 'little') for i in range(rank)]
        return dims, maxdims

    def datatype_bytes(self, m):
        cv = m[0]
        cls, ver = cv & 0x0F, cv >> 4
        bits0, bits8, bits16 = m[1], m[2], m[3]
        size = int.from_bytes(m[4:8], 'little')
        self.feat['dtype_cls%d_v%d_sz%d' % (cls, ver, size)] += 1
        info = dict(cls=cls, size=size, bits0=bits0)
        if cls == 0:
            info['signed'] = bool(bits0 & 0x08)
        if cls == 3:
            info['strpad'] = bits0 & 0x0F
        if cls == 9:  # vlen
            base = self.datatype_bytes(m[8:])
            info['base'] = base
            info['vlen_type'] = bits0 & 0x0F
        return info

    def decode_values(self, tinfo, raw, n):
        cls, size = tinfo['cls'], tinfo['size']
        if cls == 3:
            return raw.rstrip(b'\0').decode('utf-8', 'replace')
        if cls == 1:
            fmt = '<f' if size == 4 else '<d'
            return [struct.unpack_from(fmt, raw, i * size)[0] for i in range(n)]
        if cls == 0:
            sg = tinfo.get('signed', True)
            return [int.from_bytes(raw[i * size:(i + 1) * size], 'little', signed=sg)
                    for i in range(n)]
        return raw[:n * size]

    # ---------- layout / chunks ----------

    def layout(self, o):
        b = self.b
        ver = b[o]
        self.feat['layout_v%d' % ver] += 1
        if ver == 3:
            lclass = b[o + 1]
            if lclass == 1:
                return dict(cls='contiguous', addr=self.u(o + 2, 8), size=self.u(o + 10, 8))
            if lclass == 2:
                dim = b[o + 2]
                btree = self.u(o + 3, 8)
                dims = [self.u(o + 11 + 4 * i, 4) for i in range(dim)]
                return dict(cls='chunked_v1btree', btree=btree, dims=dims[:-1],
                            elem=dims[-1] if dims else None)
            if lclass == 0:
                return dict(cls='compact', size=self.u(o + 2, 2), off=o + 4)
        if ver == 4:
            lclass = b[o + 1]
            if lclass == 2:
                flags = b[o + 2]
                dimno = b[o + 3]
                encsz = b[o + 4]
                dims = [self.u(o + 5 + encsz * i, encsz) for i in range(dimno)]
                p = o + 5 + encsz * dimno
                itype = b[p]
                p += 1
                self.feat['chunk_index_t%d' % itype] += 1
                return dict(cls='chunked_v4', itype=itype, dims=dims[:-1],
                            elem=dims[-1], index_info_off=p, flags=flags)
            if lclass == 1:
                return dict(cls='contiguous', addr=self.u(o + 2, 8), size=self.u(o + 10, 8))
            if lclass == 0:
                return dict(cls='compact', size=self.u(o + 2, 2), off=o + 4)
        raise AssertionError('layout v%d' % ver)

    def filters(self, o):
        ver = self.b[o]
        n = self.b[o + 1]
        self.feat['filters_v%d' % ver] += 1
        out = []
        p = o + 8 if ver == 1 else o + 2
        for _ in range(n):
            fid = self.u(p, 2)
            if ver == 1 or fid >= 256:
                nlen = self.u(p + 2, 2)
                ncv = self.u(p + 6, 2)
                p += 8 + ((nlen + 7) & ~7 if ver == 1 else nlen)
            else:
                ncv = self.u(p + 4, 2)
                p += 6
            cvals = [self.u(p + 4 * i, 4) for i in range(ncv)]
            p += 4 * ncv
            if ver == 1 and ncv % 2 == 1:
                p += 4
            out.append((fid, cvals))
            self.feat['filter_%d' % fid] += 1
        return out


def min_bytes(v):
    n = 0
    while v > 0:
        v >>= 8
        n += 1
    return max(n, 1)


def walk(path, verbose=False):
    h = H5(path)
    if h.root_ohdr is None:
        e = h.ste(h.root_ste)
        if e['ct'] == 1:
            bt, hp = struct.unpack('<QQ', e['scratch'])
            roots = h.symtab_links(bt, hp)
            root_ms = h.msgs(e['ohdr'])
        else:
            root_ms = h.msgs(e['ohdr'])
            roots = h.group_links(root_ms)
    else:
        root_ms = h.msgs(h.root_ohdr)
        roots = h.group_links(root_ms)

    datasets = []

    def visit(name, ohdr, depth=0):
        ms = h.msgs(ohdr)
        types = [m[0] for m in ms]
        if 0x08 in types:
            ds = next(m for m in ms if m[0] == 0x01)
            dt = next(m for m in ms if m[0] == 0x03)
            lo = next(m for m in ms if m[0] == 0x08)
            dims, maxd = h.dataspace_bytes(h.b[ds[1]:ds[1] + ds[2]])
            t = h.datatype_bytes(h.b[dt[1]:dt[1] + dt[2]])
            l = h.layout(lo[1])
            fl = []
            for m in ms:
                if m[0] == 0x0B:
                    fl = h.filters(m[1])
            attrs = h.attributes(ms)
            datasets.append(dict(name=name, dims=dims, maxdims=maxd,
                                 dtype=t, layout=l, filters=fl, attrs=attrs))
            if verbose:
                print(' ' * depth + name, dims, 'cls%d/%d' % (t['cls'], t['size']),
                      l['cls'], fl, [a[0] for a in attrs])
        elif 0x02 in types or 0x11 in types or 0x06 in types:
            h.feat['subgroup' if depth else 'rootgroup'] += 1
            for nm, oh in h.group_links(ms):
                visit(name + '/' + nm, oh, depth + 1)
        else:
            h.feat['other_object'] += 1

    h.feat['rootgroup'] += 0
    for nm, oh in roots:
        visit(nm, oh, 1)
    # root attributes too
    h.attributes(root_ms)
    return h, datasets


if __name__ == '__main__':
    import glob
    total = collections.Counter()
    files = sys.argv[1:] or sorted(glob.glob('/root/reference/tests/sample_data/**/*.nc', recursive=True))
    for f in files:
        try:
            h, ds = walk(f, verbose=(len(files) == 1))
            total.update(h.feat)
            total['files_ok'] += 1
        except Exception as ex:
            total['fail_%s:%s' % (type(ex).__name__, ex)] += 1
    for k, v in sorted(total.items()):
        print(v, k)


# ---------- chunk decode (independent verification / oracle derivation) ----------

def unshuffle(raw, es):
    if es <= 1:
        return raw
    n = len(raw) // es
    out = bytearray(len(raw))
    for j in range(es):
        out[j::es] = raw[j * n:(j + 1) * n]
    return bytes(out)

def decode_var(path, var):
    """All (chunk_key, idx, value) of one variable, zlib+shuffle inverted."""
    h5 = H5(path)
    if h5.root_ohdr is None:
        e = h5.ste(h5.root_ste)
        if e['ct'] == 1:
            bt, hp = struct.unpack('<QQ', e['scratch'])
            roots = h5.symtab_links(bt, hp)
        else:
            roots = h5.group_links(h5.msgs(e['ohdr']))
    else:
        roots = h5.group_links(h5.msgs(h5.root_ohdr))
    target = dict(roots)[var]
    ms = h5.msgs(target)
    dims, _ = h5.dataspace_bytes(h5.b[[m for m in ms if m[0]==1][0][1]:])
    dt = h5.datatype_bytes(h5.b[[m for m in ms if m[0]==3][0][1]:])
    lo = h5.layout([m for m in ms if m[0]==8][0][1])
    fl = []
    for m in ms:
        if m[0] == 0x0B:
            fl = h5.filters(m[1])
    order = '>' if dt['bits0'] & 1 else '<'
    fmt = {(1,4):'f',(1,8):'d',(0,4):'i',(0,2):'h',(0,1):'b',(0,8):'q'}[(dt['cls'],dt['size'])]
    shape = dims if dims else [1]
    out = []
    def decode_chunk(raw, key, nelem):
        data = raw
        for fid, cv in reversed(fl):
            if fid == 1: data = zlib.decompress(data)
            elif fid == 2: data = unshuffle(data, cv[0])
            else: raise AssertionError('filter %d' % fid)
        vals = struct.unpack(order + fmt * nelem, data[:nelem * dt['size']])
        for i, v in enumerate(vals):
            out.append((key, i, float(v)))
    if lo['cls'] == 'contiguous':
        n = 1
        for d in shape: n *= d
        decode_chunk(h5.b[lo['addr']:lo['addr'] + n * dt['size']], '.'.join('0' for _ in shape), n)
    elif lo['cls'] == 'chunked_v1btree':
        cdims = lo['dims']
        nelem = 1
        for d in cdims: nelem *= d
        def walk(addr):
            assert h5.b[addr:addr+4] == b'TREE'
            ntype, level = h5.b[addr+4], h5.b[addr+5]
            nent = h5.u(addr+6, 2)
            assert ntype == 1
            ksize = 8 + 8*(len(cdims)+1)
            p = addr + 24
            for i in range(nent):
                sz = h5.u(p, 4); mask = h5.u(p+4, 4)
                offs = [h5.u(p+8+8*d, 8) for d in range(len(cdims))]
                child = h5.u(p+ksize, 8)
                if level > 0: walk(child)
                else:
                    assert mask == 0
                    key = '.'.join(str(offs[d]//cdims[d]) for d in range(len(cdims)))
                    decode_chunk(h5.b[child:child+sz], key, nelem)
                p += ksize + 8
        walk(lo['btree'])
    else:
        raise AssertionError(lo['cls'])
    return out
