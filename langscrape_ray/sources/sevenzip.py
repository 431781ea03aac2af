"""Minimal 7z archive codec on the stdlib (no py7zr / 7z binary).

Closes SURVEY.md §2.1 S10: the reference ingests SWDE verticals from .7z
archives (/root/reference/feilian/dataset_tools.py:35-63 extracts them
with py7zr after download).  Neither py7zr nor a 7z binary exists in
this container, so this module implements the subset of the published 7z
format (7-Zip's DOC/7zFormat.txt) the corpus path needs, from the spec:

Reader supports:
- plain and ENCODED (LZMA/LZMA2-compressed) headers,
- single-coder folders with Copy (00), LZMA1 (030101) or LZMA2 (21)
  coders (decoded via stdlib ``lzma`` FORMAT_RAW filters),
- multiple folders, SubStreamsInfo (many files per folder), empty
  files/streams, directory entries, UTF-16LE names, CRC verification.
Anything else (BCJ/delta filters, AES encryption, bind pairs beyond the
trivial chain) raises a loud ``Unsupported7z`` — never a silent wrong
extraction.

Writer produces archives the reader (and any standard 7z tool) can open:
all file payloads concatenated through ONE folder per archive with a
Copy or LZMA2 coder, per-file sizes + CRC32s in SubStreamsInfo, plain
(uncompressed) header.  Used to build fixture archives for the ingest
tests — the round-trip plus structural CRC/layout assertions are the
correctness story in a container with no second implementation.

Scale note: a single-folder LZMA2 archive is a sequential stream, so
intra-archive parallelism is impossible by format; the Ray ingest
(sources/archive.py) therefore parallelizes PER ARCHIVE (one task per
.7z), which matches the SWDE layout of one archive per vertical.
"""

from __future__ import annotations

import io
import lzma
import zlib
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

# property ids (7zFormat.txt)
K_END = 0x00
K_HEADER = 0x01
K_MAIN_STREAMS = 0x04
K_FILES_INFO = 0x05
K_PACK_INFO = 0x06
K_UNPACK_INFO = 0x07
K_SUBSTREAMS = 0x08
K_SIZE = 0x09
K_CRC = 0x0A
K_FOLDER = 0x0B
K_CODERS_UNPACK_SIZE = 0x0C
K_NUM_UNPACK_STREAM = 0x0D
K_EMPTY_STREAM = 0x0E
K_EMPTY_FILE = 0x0F
K_NAME = 0x11
K_MTIME = 0x14
K_ATTRIBUTES = 0x15
K_ENCODED_HEADER = 0x17
K_DUMMY = 0x19

MAGIC = b"7z\xbc\xaf\x27\x1c"

CODEC_COPY = b"\x00"
CODEC_LZMA1 = b"\x03\x01\x01"
CODEC_LZMA2 = b"\x21"


class Unsupported7z(ValueError):
    """A 7z feature outside the supported subset (loud, never silent)."""


class Corrupt7z(ValueError):
    pass


# ---------------------------------------------------------------------------
# primitive encoding
# ---------------------------------------------------------------------------

def read_number(b: bytes, pos: int) -> Tuple[int, int]:
    """7z variable-length number; returns (value, new_pos)."""
    first = b[pos]
    mask = 0x80
    value = 0
    for i in range(8):
        if (first & mask) == 0:
            value |= (first & (mask - 1)) << (8 * i)
            return value, pos + 1 + i
        value |= b[pos + 1 + i] << (8 * i)
        mask >>= 1
    return value, pos + 9


def write_number(v: int) -> bytes:
    """Inverse of read_number (shortest form)."""
    if v < 0:
        raise ValueError("7z numbers are unsigned")
    for i in range(8):
        limit = 1 << (7 * (i + 1) - i)  # bits available with i extra bytes
        # first byte keeps (7 - i) value bits after i flag bits
        if v < (1 << (7 - i)) << (8 * i):
            first = 0
            for j in range(i):
                first |= 0x80 >> j
            first |= v >> (8 * i)
            return bytes([first]) + (v & ((1 << (8 * i)) - 1)).to_bytes(i, "little")
    return bytes([0xFF]) + v.to_bytes(8, "little")


def _read_bitvector(b: bytes, pos: int, n: int) -> Tuple[List[bool], int]:
    bits: List[bool] = []
    mask = 0
    byte = 0
    for _ in range(n):
        if mask == 0:
            byte = b[pos]
            pos += 1
            mask = 0x80
        bits.append(bool(byte & mask))
        mask >>= 1
    return bits, pos


def _write_bitvector(bits: List[bool]) -> bytes:
    out = bytearray()
    byte = 0
    mask = 0x80
    for bit in bits:
        if bit:
            byte |= mask
        mask >>= 1
        if mask == 0:
            out.append(byte)
            byte, mask = 0, 0x80
    if mask != 0x80:
        out.append(byte)
    return bytes(out)


# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------

@dataclass
class _Folder:
    codec: bytes = CODEC_COPY
    props: bytes = b""
    pack_sizes: List[int] = field(default_factory=list)
    unpack_size: int = 0
    # substreams
    file_sizes: List[int] = field(default_factory=list)
    file_crcs: List[Optional[int]] = field(default_factory=list)

    def decode(self, packed: bytes) -> bytes:
        if self.codec == CODEC_COPY:
            data = packed
        elif self.codec == CODEC_LZMA2:
            if len(self.props) != 1:
                raise Unsupported7z("LZMA2 props must be 1 byte")
            p = self.props[0]
            if p > 40:
                raise Corrupt7z("bad LZMA2 dict-size byte")
            dict_size = 0xFFFFFFFF if p == 40 else (2 | (p & 1)) << (p // 2 + 11)
            data = lzma.decompress(
                packed,
                format=lzma.FORMAT_RAW,
                filters=[{"id": lzma.FILTER_LZMA2, "dict_size": dict_size}],
            )
        elif self.codec == CODEC_LZMA1:
            if len(self.props) != 5:
                raise Unsupported7z("LZMA1 props must be 5 bytes")
            d = self.props[0]
            lc, rem = d % 9, d // 9
            lp, pb = rem % 5, rem // 5
            dict_size = int.from_bytes(self.props[1:5], "little")
            dec = lzma.LZMADecompressor(
                format=lzma.FORMAT_RAW,
                filters=[{
                    "id": lzma.FILTER_LZMA1,
                    "lc": lc, "lp": lp, "pb": pb,
                    "dict_size": max(dict_size, 4096),
                }],
            )
            # raw LZMA1 streams in 7z have no end marker: decode exactly
            # unpack_size bytes
            data = dec.decompress(packed, max_length=self.unpack_size)
        else:
            raise Unsupported7z(f"codec id {self.codec.hex()} not supported")
        if len(data) != self.unpack_size:
            raise Corrupt7z(
                f"folder decoded to {len(data)} bytes, header says "
                f"{self.unpack_size}"
            )
        return data


@dataclass
class SevenZipEntry:
    name: str
    is_dir: bool
    size: int
    crc: Optional[int]
    folder: int          # -1 for empty/dir entries
    offset_in_folder: int


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------

class SevenZipReader:
    """Parse + extract the supported 7z subset from in-memory bytes."""

    def __init__(self, data: bytes):
        self._data = data
        if data[:6] != MAGIC:
            raise Corrupt7z("bad 7z signature")
        start_crc = int.from_bytes(data[8:12], "little")
        if zlib.crc32(data[12:32]) != start_crc:
            raise Corrupt7z("signature-header CRC mismatch")
        nh_off = int.from_bytes(data[12:20], "little")
        nh_size = int.from_bytes(data[20:28], "little")
        nh_crc = int.from_bytes(data[28:32], "little")
        hdr = data[32 + nh_off: 32 + nh_off + nh_size]
        if len(hdr) != nh_size or zlib.crc32(hdr) != nh_crc:
            raise Corrupt7z("next-header CRC/size mismatch")
        self.entries: List[SevenZipEntry] = []
        self._folders: List[_Folder] = []
        self._folder_pack_offset: List[int] = []
        if nh_size:
            self._parse_header(hdr)

    # -- header parsing ----------------------------------------------------

    def _parse_header(self, hdr: bytes) -> None:
        pid, pos = read_number(hdr, 0)
        if pid == K_ENCODED_HEADER:
            folders, offsets = self._parse_streams_info(hdr, pos)[0:2]
            if len(folders) != 1:
                raise Unsupported7z("encoded header with multiple folders")
            packed = self._packed_bytes(folders[0], offsets[0])
            inner = folders[0].decode(packed)
            pid, pos = read_number(inner, 0)
            if pid != K_HEADER:
                raise Corrupt7z("decoded header is not kHeader")
            self._parse_main(inner, pos)
        elif pid == K_HEADER:
            self._parse_main(hdr, pos)
        else:
            raise Corrupt7z(f"unexpected top-level property {pid:#x}")

    def _parse_main(self, b: bytes, pos: int) -> None:
        folders: List[_Folder] = []
        offsets: List[int] = []
        names: List[str] = []
        empty_stream: List[bool] = []
        empty_file: List[bool] = []
        n_files = 0
        while True:
            pid, pos = read_number(b, pos)
            if pid == K_END:
                break
            if pid == K_MAIN_STREAMS:
                folders, offsets, pos = self._parse_streams_info(b, pos)
            elif pid == K_FILES_INFO:
                n_files, pos = read_number(b, pos)
                names, empty_stream, empty_file, pos = self._parse_files_info(
                    b, pos, n_files
                )
            else:
                raise Unsupported7z(f"header property {pid:#x} not supported")
        self._folders = folders
        self._folder_pack_offset = offsets
        # assemble entries: files with streams consume folder substreams in
        # order; empty-stream entries are dirs unless flagged kEmptyFile
        sub: List[Tuple[int, int, int, Optional[int]]] = []  # folder, off, size, crc
        for fi, f in enumerate(folders):
            off = 0
            for s, c in zip(f.file_sizes, f.file_crcs):
                sub.append((fi, off, s, c))
                off += s
        if not empty_stream:
            empty_stream = [False] * n_files
        ei = 0  # index into empty_file bits (they only cover empty streams)
        si = 0
        for i in range(n_files):
            name = names[i] if i < len(names) else f"file{i}"
            if empty_stream[i]:
                is_file = bool(empty_file[ei]) if ei < len(empty_file) else False
                ei += 1
                self.entries.append(
                    SevenZipEntry(name, not is_file, 0, None, -1, 0)
                )
            else:
                if si >= len(sub):
                    raise Corrupt7z("more stream files than substreams")
                fi, off, size, crc = sub[si]
                si += 1
                self.entries.append(
                    SevenZipEntry(name, False, size, crc, fi, off)
                )

    def _parse_streams_info(
        self, b: bytes, pos: int
    ) -> Tuple[List[_Folder], List[int], int]:
        pack_pos = 0
        pack_sizes: List[int] = []
        folders: List[_Folder] = []
        while True:
            pid, pos = read_number(b, pos)
            if pid == K_END:
                break
            if pid == K_PACK_INFO:
                pack_pos, pos = read_number(b, pos)
                n_pack, pos = read_number(b, pos)
                pid2, pos = read_number(b, pos)
                if pid2 != K_SIZE:
                    raise Corrupt7z("PackInfo without kSize")
                for _ in range(n_pack):
                    s, pos = read_number(b, pos)
                    pack_sizes.append(s)
                pid2, pos = read_number(b, pos)
                if pid2 == K_CRC:  # optional pack CRCs: skip
                    bits, pos = _read_bitvector(b, pos, n_pack) \
                        if b[pos] == 0 else ([True] * n_pack, pos + 1)
                    pos += 4 * sum(bits)
                    pid2, pos = read_number(b, pos)
                if pid2 != K_END:
                    raise Corrupt7z("PackInfo not terminated")
            elif pid == K_UNPACK_INFO:
                folders, pos = self._parse_unpack_info(b, pos, pack_sizes)
            elif pid == K_SUBSTREAMS:
                pos = self._parse_substreams(b, pos, folders)
            else:
                raise Unsupported7z(f"streams property {pid:#x} not supported")
        # default substreams: one file per folder
        for f in folders:
            if not f.file_sizes:
                f.file_sizes = [f.unpack_size]
                f.file_crcs = [None]
        # pack offsets per folder (sequential single-pack-stream folders)
        offsets = []
        off = 32 + pack_pos
        for f in folders:
            offsets.append(off)
            off += sum(f.pack_sizes)
        return folders, offsets, pos

    def _parse_unpack_info(
        self, b: bytes, pos: int, pack_sizes: List[int]
    ) -> Tuple[List[_Folder], int]:
        pid, pos = read_number(b, pos)
        if pid != K_FOLDER:
            raise Corrupt7z("UnpackInfo without kFolder")
        n_folders, pos = read_number(b, pos)
        if b[pos] != 0:
            raise Unsupported7z("external folder definitions")
        pos += 1
        folders = []
        pack_i = 0
        for _ in range(n_folders):
            n_coders, pos = read_number(b, pos)
            if n_coders != 1:
                raise Unsupported7z("multi-coder folders (BCJ/filter chains)")
            flags = b[pos]
            pos += 1
            id_size = flags & 0x0F
            codec = b[pos: pos + id_size]
            pos += id_size
            if flags & 0x10:  # complex: explicit stream counts
                n_in, pos = read_number(b, pos)
                n_out, pos = read_number(b, pos)
                if n_in != 1 or n_out != 1:
                    raise Unsupported7z("multi-stream coder")
            props = b""
            if flags & 0x20:
                psize, pos = read_number(b, pos)
                props = b[pos: pos + psize]
                pos += psize
            if flags & 0x80:
                raise Unsupported7z("alternative coder methods")
            f = _Folder(codec=codec, props=props)
            f.pack_sizes = [pack_sizes[pack_i]]
            pack_i += 1
            folders.append(f)
        pid, pos = read_number(b, pos)
        if pid != K_CODERS_UNPACK_SIZE:
            raise Corrupt7z("UnpackInfo without kCodersUnpackSize")
        for f in folders:
            f.unpack_size, pos = read_number(b, pos)
        pid, pos = read_number(b, pos)
        if pid == K_CRC:
            all_defined = b[pos]
            pos += 1
            if all_defined:
                bits = [True] * n_folders
            else:
                bits, pos = _read_bitvector(b, pos, n_folders)
            pos += 4 * sum(bits)
            pid, pos = read_number(b, pos)
        if pid != K_END:
            raise Corrupt7z("UnpackInfo not terminated")
        return folders, pos

    def _parse_substreams(
        self, b: bytes, pos: int, folders: List[_Folder]
    ) -> int:
        counts = [1] * len(folders)
        pid, pos = read_number(b, pos)
        if pid == K_NUM_UNPACK_STREAM:
            counts = []
            for _ in folders:
                c, pos = read_number(b, pos)
                counts.append(c)
            pid, pos = read_number(b, pos)
        if pid == K_SIZE:
            for f, c in zip(folders, counts):
                sizes = []
                for _ in range(c - 1):
                    s, pos = read_number(b, pos)
                    sizes.append(s)
                if c > 0:
                    sizes.append(f.unpack_size - sum(sizes))
                f.file_sizes = sizes
            pid, pos = read_number(b, pos)
        else:
            for f, c in zip(folders, counts):
                if c != 1:
                    raise Corrupt7z("multiple substreams but no kSize")
                f.file_sizes = [f.unpack_size]
        n_unknown = sum(len(f.file_sizes) for f in folders)
        for f in folders:
            f.file_crcs = [None] * len(f.file_sizes)
        if pid == K_CRC:
            all_defined = b[pos]
            pos += 1
            if all_defined:
                bits = [True] * n_unknown
            else:
                bits, pos = _read_bitvector(b, pos, n_unknown)
            crcs = []
            for bit in bits:
                if bit:
                    crcs.append(int.from_bytes(b[pos: pos + 4], "little"))
                    pos += 4
                else:
                    crcs.append(None)
            i = 0
            for f in folders:
                f.file_crcs = crcs[i: i + len(f.file_sizes)]
                i += len(f.file_sizes)
            pid, pos = read_number(b, pos)
        if pid != K_END:
            raise Corrupt7z("SubStreamsInfo not terminated")
        return pos

    def _parse_files_info(
        self, b: bytes, pos: int, n_files: int
    ) -> Tuple[List[str], List[bool], List[bool], int]:
        names: List[str] = []
        empty_stream: List[bool] = []
        empty_file: List[bool] = []
        while True:
            pid, pos = read_number(b, pos)
            if pid == K_END:
                break
            size, pos = read_number(b, pos)
            body = b[pos: pos + size]
            pos += size
            if pid == K_EMPTY_STREAM:
                empty_stream, _ = _read_bitvector(body, 0, n_files)
            elif pid == K_EMPTY_FILE:
                n_empty = sum(empty_stream)
                empty_file, _ = _read_bitvector(body, 0, n_empty)
            elif pid == K_NAME:
                if body[0] != 0:
                    raise Unsupported7z("external names")
                raw = body[1:].decode("utf-16-le")
                names = raw.split("\x00")[:-1]
            elif pid in (K_MTIME, K_ATTRIBUTES, K_DUMMY):
                continue  # metadata we don't need; sized, so safely skipped
            else:
                raise Unsupported7z(f"FilesInfo property {pid:#x} not supported")
        return names, empty_stream, empty_file, pos

    # -- extraction ----------------------------------------------------------

    def _packed_bytes(self, folder: _Folder, offset: int) -> bytes:
        return self._data[offset: offset + sum(folder.pack_sizes)]

    def read_all(self) -> Dict[str, bytes]:
        """name -> bytes for every file (dirs omitted), CRC-verified."""
        decoded = [
            f.decode(self._packed_bytes(f, off))
            for f, off in zip(self._folders, self._folder_pack_offset)
        ]
        out: Dict[str, bytes] = {}
        for e in self.entries:
            if e.is_dir:
                continue
            if e.folder < 0:
                out[e.name] = b""
                continue
            data = decoded[e.folder][e.offset_in_folder: e.offset_in_folder + e.size]
            if e.crc is not None and zlib.crc32(data) != e.crc:
                raise Corrupt7z(f"CRC mismatch for {e.name}")
            out[e.name] = data
        return out

    def namelist(self) -> List[str]:
        return [e.name for e in self.entries if not e.is_dir]


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

def write_7z(files: Dict[str, bytes], codec: str = "lzma2") -> bytes:
    """Serialize ``{name: bytes}`` into a 7z archive (ONE folder holding
    all payloads, plain header).  codec: 'copy' or 'lzma2'."""
    names = list(files)
    payloads = [files[n] for n in names]
    nonempty = [(n, p) for n, p in zip(names, payloads) if p != b""]
    empties = [n for n, p in zip(names, payloads) if p == b""]
    blob = b"".join(p for _, p in nonempty)

    if codec == "copy":
        packed = blob
        codec_id, props = CODEC_COPY, b""
    elif codec == "lzma2":
        dict_size = 1 << 24
        packed = lzma.compress(
            blob,
            format=lzma.FORMAT_RAW,
            filters=[{"id": lzma.FILTER_LZMA2, "dict_size": dict_size}],
        )
        codec_id, props = CODEC_LZMA2, bytes([24])  # 2<<(12+11) == 1<<24
    else:
        raise ValueError("codec must be 'copy' or 'lzma2'")

    hdr = bytearray()
    hdr += write_number(K_HEADER)
    if nonempty:
        hdr += write_number(K_MAIN_STREAMS)
        # PackInfo
        hdr += write_number(K_PACK_INFO)
        hdr += write_number(0)            # pack pos
        hdr += write_number(1)            # one pack stream
        hdr += write_number(K_SIZE)
        hdr += write_number(len(packed))
        hdr += write_number(K_END)
        # UnpackInfo
        hdr += write_number(K_UNPACK_INFO)
        hdr += write_number(K_FOLDER)
        hdr += write_number(1)            # one folder
        hdr += bytes([0])                 # not external
        hdr += write_number(1)            # one coder
        flags = len(codec_id) | (0x20 if props else 0)
        hdr += bytes([flags]) + codec_id
        if props:
            hdr += write_number(len(props)) + props
        hdr += write_number(K_CODERS_UNPACK_SIZE)
        hdr += write_number(len(blob))
        hdr += write_number(K_END)
        # SubStreamsInfo
        hdr += write_number(K_SUBSTREAMS)
        hdr += write_number(K_NUM_UNPACK_STREAM)
        hdr += write_number(len(nonempty))
        hdr += write_number(K_SIZE)
        for _, p in nonempty[:-1]:
            hdr += write_number(len(p))
        hdr += write_number(K_CRC)
        hdr += bytes([1])                 # all CRCs defined
        for _, p in nonempty:
            hdr += zlib.crc32(p).to_bytes(4, "little")
        hdr += write_number(K_END)
        hdr += write_number(K_END)        # end MainStreamsInfo
    # FilesInfo: empties first in the bit vector order they appear
    ordered = [n for n, _ in nonempty] + empties
    hdr += write_number(K_FILES_INFO)
    hdr += write_number(len(ordered))
    if empties:
        bits = [False] * len(nonempty) + [True] * len(empties)
        bv = _write_bitvector(bits)
        hdr += write_number(K_EMPTY_STREAM)
        hdr += write_number(len(bv)) + bv
        efv = _write_bitvector([True] * len(empties))
        hdr += write_number(K_EMPTY_FILE)
        hdr += write_number(len(efv)) + efv
    name_blob = b"\x00" + "".join(n + "\x00" for n in ordered).encode("utf-16-le")
    hdr += write_number(K_NAME)
    hdr += write_number(len(name_blob)) + name_blob
    hdr += write_number(K_END)            # end FilesInfo
    hdr += write_number(K_END)            # end Header
    hdr = bytes(hdr)

    out = io.BytesIO()
    start = bytearray()
    start += len(packed).to_bytes(8, "little")   # next header offset
    start += len(hdr).to_bytes(8, "little")
    start += zlib.crc32(hdr).to_bytes(4, "little")
    out.write(MAGIC + bytes([0, 4]))
    out.write(zlib.crc32(bytes(start)).to_bytes(4, "little"))
    out.write(bytes(start))
    out.write(packed)
    out.write(hdr)
    return out.getvalue()
