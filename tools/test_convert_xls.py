#!/usr/bin/env python3
"""Synthetic-container tests for convert_xls.py (driver-side tooling).

Builds minimal MS-CFB containers + BIFF8 workbook streams from scratch
(no Excel involved) and asserts the two hardening behaviors:

  1. v4 containers (4096-byte sectors) parse via the (n+1)*ssz offset
     math — a hardcoded 512-byte header would shred every sector.
  2. An SST string header split across a CONTINUE boundary raises a
     loud ValueError instead of silently mis-parsing.

plus the normal path: strings crossing a CONTINUE at a character
boundary, LABELSST/NUMBER cells, header row extraction.

Run: python3 tools/test_convert_xls.py
"""
import struct
import sys
import tempfile

sys.path.insert(0, __import__("os").path.dirname(__file__))
from convert_xls import parse_xls  # noqa: E402

ENDOFCHAIN = 0xFFFFFFFE
FREESECT = 0xFFFFFFFF
FATSECT = 0xFFFFFFFD


def rec(op, payload):
    return struct.pack("<HH", op, len(payload)) + payload


def build_workbook(sst_frags):
    """BIFF8 stream: SST(+CONTINUEs) from raw fragment payloads, one
    BOUNDSHEET, globals EOF, then a sheet with 2x2 cells. Padded past
    the 4096 mini-stream cutoff so the stream lives in the normal FAT.
    """
    sst = rec(0x00FC, sst_frags[0])
    for f in sst_frags[1:]:
        sst += rec(0x003C, f)
    # BOUNDSHEET offset is filled in after globals are sized
    globals_tail = rec(0x0085, struct.pack("<I", 0) + b"\x00\x06sheet1")
    globals_tail += rec(0x000A, b"")
    sheet = (
        rec(0x00FD, struct.pack("<HHHI", 0, 0, 0, 0))    # hdr "name"
        + rec(0x00FD, struct.pack("<HHHI", 0, 1, 0, 1))  # hdr "val"
        + rec(0x00FD, struct.pack("<HHHI", 1, 0, 0, 2))  # row1 str
        + rec(0x0203, struct.pack("<HHH", 1, 1, 0) + struct.pack("<d", 42.5))
        + rec(0x000A, b""))
    sheet_off = len(sst) + len(globals_tail)
    globals_tail = (rec(0x0085, struct.pack("<I", sheet_off) + b"\x00\x06sheet1")
                    + rec(0x000A, b""))
    wb = sst + globals_tail + sheet
    while len(wb) <= 4096:  # stay out of the mini-stream
        wb += rec(0x0042, struct.pack("<H", 1252))  # CODEPAGE padding
    return wb


def dir_entry(name, typ, start, size):
    raw = bytearray(128)
    enc = name.encode("utf-16-le")
    raw[0:len(enc)] = enc
    struct.pack_into("<H", raw, 64, len(enc) + 2)
    raw[66] = typ
    struct.pack_into("<I", raw, 116, start)
    struct.pack_into("<Q", raw, 120, size)
    return bytes(raw)


def build_cfb(ssz, wb):
    """Container: sector 0 = directory, 1..m = workbook, m+1 = FAT."""
    shift = ssz.bit_length() - 1
    m = -(-len(wb) // ssz)
    fat_sector = m + 1
    fat = [ENDOFCHAIN]                      # dir (single sector)
    fat += list(range(2, m + 1)) + [ENDOFCHAIN]  # wb chain 1..m
    fat += [FATSECT]
    fat += [FREESECT] * (ssz // 4 - len(fat))
    directory = (dir_entry("Root Entry", 5, ENDOFCHAIN, 0)
                 + dir_entry("Workbook", 2, 1, len(wb)))
    directory += b"\x00" * (ssz - len(directory) % ssz if len(directory) % ssz else 0)
    header = bytearray(ssz)  # v4 headers are 512B zero-padded to 4096
    header[0:8] = bytes.fromhex("d0cf11e0a1b11ae1")
    struct.pack_into("<H", header, 30, shift)
    struct.pack_into("<H", header, 32, 6)
    struct.pack_into("<I", header, 44, 1)            # one FAT sector
    struct.pack_into("<I", header, 48, 0)            # dir start
    struct.pack_into("<I", header, 56, 4096)         # mini cutoff
    struct.pack_into("<I", header, 60, ENDOFCHAIN)   # no mini FAT
    struct.pack_into("<I", header, 68, ENDOFCHAIN)   # no DIFAT chain
    struct.pack_into("<I", header, 72, 0)
    struct.pack_into("<109I", header, 76, *([fat_sector] + [FREESECT] * 108))
    body = bytearray()
    body += directory
    body += wb + b"\x00" * (m * ssz - len(wb))
    body += struct.pack(f"<{ssz // 4}I", *fat)
    return bytes(header) + bytes(body)


def unistr(s):
    """Uncompressed-flag-off (latin-1) XLUnicodeRichExtendedString."""
    return struct.pack("<HB", len(s), 0) + s.encode("latin-1")


def write_and_parse(ssz, sst_frags):
    data = build_cfb(ssz, build_workbook(sst_frags))
    with tempfile.NamedTemporaryFile(suffix=".xls", delete=False) as f:
        f.write(data)
        path = f.name
    return parse_xls(path)


def main():
    # one SST fragment, 3 strings, third crosses a CONTINUE at a char
    # boundary (its own grbit byte restated in the continuation)
    whole = struct.pack("<II", 3, 3) + unistr("name") + unistr("val")
    crossing_head = struct.pack("<HB", 5, 0) + b"he"      # cch=5, 2 chars
    crossing_tail = b"\x00" + b"llo"                      # grbit + rest
    frags_ok = [whole + crossing_head, crossing_tail]

    for ssz, label in ((512, "v3"), (4096, "v4")):
        header, rows = write_and_parse(ssz, frags_ok)
        assert header == ["name", "val"], (label, header)
        assert rows == [["hello", 42.5]], (label, rows)
        print(f"OK   {label} container: header + CONTINUE-crossing string + cells")

    # header split across CONTINUE: frag0 ends with ONE byte of cch
    split = [struct.pack("<II", 3, 3) + unistr("name") + unistr("val") + b"\x05",
             b"\x00\x00hello"]
    try:
        write_and_parse(512, split)
    except ValueError as e:
        assert "split across CONTINUE" in str(e), e
        print("OK   split SST header fails loud:", e)
    else:
        raise AssertionError("split SST header was silently accepted")

    print("all convert_xls tests passed")


if __name__ == "__main__":
    main()
