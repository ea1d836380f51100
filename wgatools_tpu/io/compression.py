"""Transparent compressed I/O with magic-byte sniffing.

Mirrors the reference's reader/writer plumbing (reference: src/utils.rs:38-246):
inputs are sniffed by magic bytes (gz/bz2/xz) or extension; outputs are
compressed when the path ends in .gz/.bz2/.xz; "-" means stdin/stdout; output
files refuse to overwrite unless rewrite is set.
"""

import bz2
import gzip
import io
import lzma
import os
import sys

from ..errors import EmptyStdin, FileNotExist, FileReWrite

BUFFER_SIZE = 32 * 1024

GZ_MAGIC = b"\x1f\x8b\x08"
BZ_MAGIC = b"\x42\x5a\x68"
XZ_MAGIC = b"\xfd\x37\x7a\x58\x5a\x00"


def _sniff(path: str) -> bytes:
    with open(path, "rb") as fp:
        return fp.read(6)


def open_input(path):
    """Open an input for binary buffered reading.

    `path` None (or "-") reads stdin; otherwise the file is opened with
    transparent gz/bz2/xz decompression chosen by magic bytes or extension.
    """
    if path is None or path == "-":
        try:
            if sys.stdin.isatty():
                raise EmptyStdin()
        except AttributeError:
            pass
        return sys.stdin.buffer
    if not os.path.exists(path):
        raise FileNotExist(path)
    magic = _sniff(path)
    ext = os.path.splitext(path)[1]
    if magic.startswith(XZ_MAGIC) or ext == ".xz":
        return io.BufferedReader(lzma.open(path, "rb"), BUFFER_SIZE)
    if magic.startswith(GZ_MAGIC) or ext == ".gz":
        return io.BufferedReader(gzip.open(path, "rb"), BUFFER_SIZE)
    if magic.startswith(BZ_MAGIC) or ext == ".bz2":
        return io.BufferedReader(bz2.open(path, "rb"), BUFFER_SIZE)
    return open(path, "rb", buffering=BUFFER_SIZE)


def check_outfile(path: str, rewrite: bool):
    """Refuse to overwrite an existing output unless rewrite
    (reference: utils.rs:231-246)."""
    if path != "-" and os.path.exists(path):
        if not rewrite:
            raise FileReWrite(path)


def open_output(path: str, rewrite: bool):
    """Open an output for binary buffered writing, compressing by extension."""
    check_outfile(path, rewrite)
    if path == "-":
        # wrap in a big buffer: per-row write() syscalls dominate when
        # emitting millions of VCF/BED lines to a pipe
        return io.BufferedWriter(
            os.fdopen(os.dup(sys.stdout.fileno()), "wb", closefd=True),
            1 << 20,
        )
    ext = os.path.splitext(path)[1]
    level = 6
    if ext == ".xz":
        return io.BufferedWriter(lzma.open(path, "wb", preset=level), BUFFER_SIZE)
    if ext == ".gz":
        return io.BufferedWriter(
            gzip.open(path, "wb", compresslevel=level), BUFFER_SIZE
        )
    if ext == ".bz2":
        return io.BufferedWriter(
            bz2.open(path, "wb", compresslevel=level), BUFFER_SIZE
        )
    return open(path, "wb", buffering=BUFFER_SIZE)
