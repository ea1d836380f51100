from .compression import open_input, open_output  # noqa: F401
from .maf import MafReader, MafRecord, MafSLine, MafWriter  # noqa: F401
from .paf import PafReader, PafRecord, PafWriter  # noqa: F401
from .chain import ChainHeader, ChainReader, ChainRecord  # noqa: F401
from .fasta import FastaReader  # noqa: F401
