#!/usr/bin/env python3
"""Convert a legacy Excel .xls (BIFF8 inside an OLE2/CFB container) to
CSV or parquet, with no third-party Excel dependency.

Closes the loop on SURVEY.md S5: the reference reads
`medicamentos.xls` via `pd.read_excel` (`/root/reference/dimension.py:62-64`);
our engine consumes the equivalent tabular fixture. This tool IS the
converter that produces such a fixture from a real .xls, so a reference
user can bring their own price list:

    python3 tools/convert_xls.py input.xls output.csv
    python3 tools/convert_xls.py input.xls output.parquet   # needs pyarrow

Format notes (all public: MS-CFB and MS-XLS specifications):
  - OLE2/CFB: 512-byte sectors, FAT chains from the header DIFAT, a
    mini-FAT for streams under 4096 bytes stored in the root entry's
    mini stream.
  - BIFF8 records: [u16 opcode][u16 length][payload]. Shared strings
    live in the SST record (opcode 0x00FC, continued via 0x003C with a
    re-stated compression flag per fragment); cells reference them via
    LABELSST (0x00FD). Numbers are NUMBER (0x0203, IEEE double), RK
    (0x027E, packed 30-bit), or MULRK (0x00BD). BOUNDSHEET (0x0085)
    points at each sheet's BOF.

Driver-side tooling only — the engine itself never parses BIFF.
"""
import struct
import sys

FREESECT = 0xFFFFFFFF
ENDOFCHAIN = 0xFFFFFFFE


class Cfb:
    """Minimal OLE2 compound-file reader (MS-CFB)."""

    def __init__(self, data):
        if data[:8] != bytes.fromhex("d0cf11e0a1b11ae1"):
            raise ValueError("not an OLE2 compound file")
        self.data = data
        self.ssz = 1 << struct.unpack_from("<H", data, 30)[0]
        self.mssz = 1 << struct.unpack_from("<H", data, 32)[0]
        nfat = struct.unpack_from("<I", data, 44)[0]
        self.dir_start = struct.unpack_from("<I", data, 48)[0]
        self.cutoff = struct.unpack_from("<I", data, 56)[0]
        self.minifat_start = struct.unpack_from("<I", data, 60)[0]
        difat_start = struct.unpack_from("<I", data, 68)[0]
        ndifat = struct.unpack_from("<I", data, 72)[0]
        fat_sectors = list(struct.unpack_from("<109I", data, 76))
        s = difat_start
        for _ in range(ndifat):
            body = self._sector(s)
            fat_sectors += struct.unpack_from(f"<{self.ssz // 4 - 1}I", body)
            s = struct.unpack_from("<I", body, self.ssz - 4)[0]
        self.fat = []
        for fs in fat_sectors[:nfat]:
            self.fat += struct.unpack_from(f"<{self.ssz // 4}I", self._sector(fs))
        self.minifat = []
        s = self.minifat_start
        while s not in (ENDOFCHAIN, FREESECT):
            self.minifat += struct.unpack_from(f"<{self.ssz // 4}I", self._sector(s))
            s = self.fat[s]
        self.entries = self._read_dir()
        root = next(e for e in self.entries if e["type"] == 5)
        self.mini_stream = self._chain(root["start"], root["size"])

    def _sector(self, n):
        # sector n starts at (n+1)*ssz: the header occupies one full
        # sector, which is 512 bytes in v3 but 4096 in v4 — "512 + n*ssz"
        # would mis-read every v4 sector into garbage
        off = (n + 1) * self.ssz
        return self.data[off:off + self.ssz]

    def _chain(self, start, size):
        out, s = bytearray(), start
        while s not in (ENDOFCHAIN, FREESECT) and len(out) < size:
            out += self._sector(s)
            s = self.fat[s]
        return bytes(out[:size])

    def _mini_chain(self, start, size):
        out, s = bytearray(), start
        while s not in (ENDOFCHAIN, FREESECT) and len(out) < size:
            out += self.mini_stream[s * self.mssz:(s + 1) * self.mssz]
            s = self.minifat[s]
        return bytes(out[:size])

    def _read_dir(self):
        raw, entries = self._chain(self.dir_start, 1 << 62), []
        for off in range(0, len(raw) - 127, 128):
            nlen = struct.unpack_from("<H", raw, off + 64)[0]
            if nlen == 0:
                continue
            entries.append({
                "name": raw[off:off + nlen - 2].decode("utf-16-le"),
                "type": raw[off + 66],
                "start": struct.unpack_from("<I", raw, off + 116)[0],
                "size": struct.unpack_from("<Q", raw, off + 120)[0],
            })
        return entries

    def stream(self, name):
        e = next(x for x in self.entries if x["name"] == name)
        if e["size"] < self.cutoff:
            return self._mini_chain(e["start"], e["size"])
        return self._chain(e["start"], e["size"])


def _records(buf):
    """Yield (opcode, payload) BIFF records."""
    pos = 0
    while pos + 4 <= len(buf):
        op, ln = struct.unpack_from("<HH", buf, pos)
        yield op, buf[pos + 4:pos + 4 + ln]
        pos += 4 + ln


def _read_unistr(frags):
    """Read the SST's XLUnicodeRichExtendedString sequence from a list
    of (payload) fragments (SST + CONTINUEs). Strings may span fragment
    boundaries; each continuation re-states its own compression byte.
    Returns the list of strings."""
    nstr = struct.unpack_from("<I", frags[0], 4)[0]
    out = []
    fi, pos = 0, 8  # skip cstTotal/cstUnique

    def take_header(n):
        nonlocal fi, pos
        if pos + n > len(frags[fi]):
            # headers never split across CONTINUE in practice, so we
            # only ever step fragments when EXACTLY at the boundary; a
            # writer that does split one would be silently mis-parsed
            # here — fail loud instead
            if pos != len(frags[fi]):
                raise ValueError(
                    f"SST string header split across CONTINUE at frag {fi} "
                    f"offset {pos}/{len(frags[fi])} — unsupported")
            fi += 1
            pos = 0
        b = frags[fi][pos:pos + n]
        pos += n
        return b

    for _ in range(nstr):
        cch = struct.unpack("<H", take_header(2))[0]
        grbit = take_header(1)[0]
        high = grbit & 0x01
        rich = (grbit & 0x08) >> 3
        ext = (grbit & 0x04) >> 2
        crun = struct.unpack("<H", take_header(2))[0] if rich else 0
        cbext = struct.unpack("<I", take_header(4))[0] if ext else 0
        chars = []
        remaining = cch
        while remaining:
            avail = len(frags[fi]) - pos
            if avail == 0:
                fi += 1
                pos = 0
                high = frags[fi][pos] & 0x01  # re-stated per fragment
                pos += 1
                continue
            width = 2 if high else 1
            n = min(remaining, avail // width)
            if n == 0:  # lone byte of a 2-byte char at fragment end
                fi += 1
                pos = 0
                high = frags[fi][pos] & 0x01
                pos += 1
                continue
            raw = frags[fi][pos:pos + n * width]
            pos += n * width
            chars.append(raw.decode("utf-16-le" if high else "latin-1"))
            remaining -= n
        # skip formatting runs / extended data (may cross fragments)
        skip = crun * 4 + cbext
        while skip:
            avail = len(frags[fi]) - pos
            step = min(skip, avail)
            pos += step
            skip -= step
            if skip:
                fi += 1
                pos = 0
        out.append("".join(chars))
    return out


def _rk_value(rk):
    if rk & 0x02:  # integer
        v = struct.unpack("<i", struct.pack("<I", rk & 0xFFFFFFFC))[0] >> 2
        v = float(v)
    else:  # top 30 bits of an IEEE double
        v = struct.unpack("<d", struct.pack("<Q", (rk & 0xFFFFFFFC) << 32))[0]
    return v / 100.0 if rk & 0x01 else v


def parse_xls(path):
    """Return (header, rows) from the FIRST worksheet of a BIFF8 .xls."""
    cfb = Cfb(open(path, "rb").read())
    name = next((e["name"] for e in cfb.entries if e["name"] in ("Workbook", "Book")), None)
    if name is None:
        raise ValueError("no Workbook stream")
    wb = cfb.stream(name)

    # Pass 1: workbook globals — SST (+ CONTINUEs) and first BOUNDSHEET
    sst, sheet_off = [], None
    recs = list(_records(wb))
    i = 0
    while i < len(recs):
        op, payload = recs[i]
        if op == 0x00FC:  # SST
            frags = [payload]
            while i + 1 < len(recs) and recs[i + 1][0] == 0x003C:
                frags.append(recs[i + 1][1])
                i += 1
            sst = _read_unistr(frags)
        elif op == 0x0085 and sheet_off is None:  # BOUNDSHEET
            sheet_off = struct.unpack_from("<I", payload, 0)[0]
        elif op == 0x000A and sheet_off is not None:  # EOF of globals
            break
        i += 1

    # Pass 2: the sheet substream — cell records only
    cells = {}
    for op, payload in _records(wb[sheet_off:]):
        if op == 0x00FD:  # LABELSST
            r, c, _xf, isst = struct.unpack_from("<HHHI", payload)
            cells[(r, c)] = sst[isst]
        elif op == 0x0203:  # NUMBER
            r, c, _xf = struct.unpack_from("<HHH", payload)
            cells[(r, c)] = struct.unpack_from("<d", payload, 6)[0]
        elif op == 0x027E:  # RK
            r, c, _xf, rk = struct.unpack_from("<HHHI", payload)
            cells[(r, c)] = _rk_value(rk)
        elif op == 0x00BD:  # MULRK
            r, c0 = struct.unpack_from("<HH", payload)
            n = (len(payload) - 6) // 6
            for k in range(n):
                _xf, rk = struct.unpack_from("<HI", payload, 4 + 6 * k)
                cells[(r, c0 + k)] = _rk_value(rk)
        elif op == 0x0204:  # LABEL (inline string, rare in BIFF8)
            r, c, _xf, cch = struct.unpack_from("<HHHH", payload)
            grbit = payload[8]
            s = payload[9:9 + cch * (2 if grbit & 1 else 1)]
            cells[(r, c)] = s.decode("utf-16-le" if grbit & 1 else "latin-1")
        elif op == 0x000A:  # EOF — end of first sheet
            break

    if not cells:
        raise ValueError("no cells parsed")
    nrow = max(r for r, _ in cells) + 1
    ncol = max(c for _, c in cells) + 1
    grid = [[cells.get((r, c)) for c in range(ncol)] for r in range(nrow)]
    header = [str(h) if h is not None else f"col{j}" for j, h in enumerate(grid[0])]
    return header, grid[1:]


def main():
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    src, dst = sys.argv[1], sys.argv[2]
    header, rows = parse_xls(src)
    if dst.endswith(".parquet"):
        import pyarrow as pa
        import pyarrow.parquet as pq
        cols = list(zip(*rows)) if rows else [[] for _ in header]
        pq.write_table(pa.table(dict(zip(header, [list(c) for c in cols]))), dst)
    else:
        import csv
        with open(dst, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(header)
            w.writerows(rows)
    print(f"{src}: {len(rows)} rows x {len(header)} cols -> {dst}")
    print("columns:", ", ".join(header))


if __name__ == "__main__":
    main()
