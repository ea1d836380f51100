"""Minimal VCF writer matching the reference's noodles output
(reference: src/tools/caller.rs:304-386, README.md:321-343)."""

from ..core.natsort import natural_key

HEADER_LINES = (
    "##fileformat=VCFv4.4",
    '##INFO=<ID=SVLEN,Number=A,Type=Integer,Description="Length of structural variant">',
    '##INFO=<ID=SVTYPE,Number=1,Type=String,Description="Type of structural variant">',
    '##INFO=<ID=END,Number=1,Type=Integer,Description="End position of the longest variant described in this record">',
    '##INFO=<ID=INV_NEST,Number=1,Type=String,Description="Varations nested within inversion">',
    '##FORMAT=<ID=QI,Number=1,Type=String,Description="Query informations">',
    '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">',
)


class VcfWriter:
    def __init__(self, stream, sample: str = "sample"):
        self.inner = stream
        self.sample = sample

    def write_header(self, contigs=None):
        """contigs: iterable of (name, length), natural-sorted
        (reference: caller.rs:339-357)."""
        out = list(HEADER_LINES)
        if contigs:
            ordered = sorted(contigs, key=lambda c: natural_key(c[0]))
            for name, length in ordered:
                out.append(f"##contig=<ID={name},length={length}>")
        out.append(
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
            + self.sample
        )
        self.inner.write(("\n".join(out) + "\n").encode("ascii"))

    def write_raw(self, blob: bytes):
        self.inner.write(blob)

    def format_record(
        self, chrom, pos, ref, alt, info=None, fmt="GT", sample_value="1|1"
    ) -> bytes:
        info_str = info if info else "."
        return (
            f"{chrom}\t{pos}\t.\t{ref}\t{alt}\t.\t.\t{info_str}\t"
            f"{fmt}\t{sample_value}\n"
        ).encode("ascii")

    def write_record(self, *args, **kwargs):
        self.inner.write(self.format_record(*args, **kwargs))
