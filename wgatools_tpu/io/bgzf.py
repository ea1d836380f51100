"""BGZF (blocked gzip) random access, replacing htslib's bgzf layer.

The reference reads bgzip-compressed FASTA through htslib faidx
(reference: Cargo.toml:26, paf.rs:221-238).  BGZF is a series of gzip
members, each with a BC extra subfield carrying the compressed block size;
random access works by mapping uncompressed offsets to block starts via
the .gzi index (or a header scan when absent) and inflating only the
blocks covering the requested range.
"""

import struct
import zlib

from ..errors import WGAError

BGZF_HEADER_LEN = 18
_EOF_BLOCK = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)


def is_bgzf(path: str) -> bool:
    with open(path, "rb") as fp:
        head = fp.read(BGZF_HEADER_LEN)
    if len(head) < BGZF_HEADER_LEN:
        return False
    if head[0:2] != b"\x1f\x8b" or head[2] != 8 or not head[3] & 4:
        return False
    # extra field must contain the BC subfield
    return head[12:14] == b"BC"


def _block_size(header: bytes) -> int:
    """Compressed size of the block from the BC subfield (BSIZE+1)."""
    return struct.unpack("<H", header[16:18])[0] + 1


def scan_index(path: str):
    """Build (compressed_offset, uncompressed_offset) block table by
    scanning block headers (reads the 18-byte header and the 4-byte ISIZE
    trailer of each block; no inflation)."""
    blocks = []
    c_off = 0
    u_off = 0
    with open(path, "rb") as fp:
        while True:
            fp.seek(c_off)
            header = fp.read(BGZF_HEADER_LEN)
            if len(header) < BGZF_HEADER_LEN:
                break
            if header[0:2] != b"\x1f\x8b":
                raise WGAError(f"bad BGZF block at offset {c_off} in {path}")
            bsize = _block_size(header)
            fp.seek(c_off + bsize - 4)
            isize = struct.unpack("<I", fp.read(4))[0]
            blocks.append((c_off, u_off))
            c_off += bsize
            u_off += isize
            if isize == 0 and bsize == len(_EOF_BLOCK):
                break
    return blocks, u_off


def load_gzi(path: str):
    """Parse a .gzi index: entries map block starts (block 0 implicit)."""
    with open(path, "rb") as fp:
        data = fp.read()
    (n,) = struct.unpack_from("<Q", data, 0)
    blocks = [(0, 0)]
    for k in range(n):
        c, u = struct.unpack_from("<QQ", data, 8 + 16 * k)
        blocks.append((c, u))
    return blocks


class BgzfReader:
    """Random access into a BGZF file by uncompressed offsets."""

    def __init__(self, path: str):
        import os

        self.path = path
        self.fp = open(path, "rb")
        gzi = path + ".gzi"
        if os.path.exists(gzi):
            self.blocks = load_gzi(gzi)
            self.total = None  # unknown without a scan; not needed
        else:
            self.blocks, self.total = scan_index(path)
        self._cache_off = None
        self._cache_data = b""
        # per-fetch bisect target; rebuilding this list per read_slice
        # costs O(blocks) on every fetch (tens of thousands of blocks on
        # a genome-scale file)
        self._u_offsets = [u for _, u in self.blocks]

    def _inflate_block(self, c_off: int) -> bytes:
        if c_off == self._cache_off:
            return self._cache_data
        self.fp.seek(c_off)
        header = self.fp.read(BGZF_HEADER_LEN)
        bsize = _block_size(header)
        self.fp.seek(c_off)
        raw = self.fp.read(bsize)
        data = zlib.decompress(raw, wbits=31)
        self._cache_off = c_off
        self._cache_data = data
        return data

    def read_slice(self, u_start: int, u_len: int) -> bytes:
        """Read `u_len` uncompressed bytes starting at `u_start`."""
        import bisect

        out = bytearray()
        k = bisect.bisect_right(self._u_offsets, u_start) - 1
        while len(out) < u_len and k < len(self.blocks):
            c_off, u_off = self.blocks[k]
            data = self._inflate_block(c_off)
            if not data:
                break
            lo = max(0, u_start - u_off)
            need = u_len - len(out)
            out += data[lo : lo + need]
            u_start = u_off + len(data)
            k += 1
        return bytes(out)

    def close(self):
        self.fp.close()


def bgzf_compress(data: bytes, block_size: int = 0xFF00) -> bytes:
    """Compress data into BGZF blocks (for writers and tests)."""
    out = bytearray()
    for lo in range(0, len(data), block_size):
        chunk = data[lo : lo + block_size]
        comp = zlib.compressobj(6, zlib.DEFLATED, -15)
        payload = comp.compress(chunk) + comp.flush()
        bsize = len(payload) + BGZF_HEADER_LEN + 8
        if bsize > 0x10000:
            raise WGAError("BGZF block too large")
        header = (
            b"\x1f\x8b\x08\x04\x00\x00\x00\x00\x00\xff"
            + struct.pack("<H", 6)
            + b"BC"
            + struct.pack("<H", 2)
            + struct.pack("<H", bsize - 1)
        )
        trailer = struct.pack(
            "<II", zlib.crc32(chunk) & 0xFFFFFFFF, len(chunk)
        )
        out += header + payload + trailer
    out += _EOF_BLOCK
    return bytes(out)


def write_gzi(path: str, blocks):
    """Write a .gzi index for the given (c_off, u_off) table."""
    entries = [b for b in blocks if b != (0, 0)]
    with open(path, "wb") as fp:
        fp.write(struct.pack("<Q", len(entries)))
        for c, u in entries:
            fp.write(struct.pack("<QQ", c, u))
