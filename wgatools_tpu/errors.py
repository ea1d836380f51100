"""Error types for wgatools-tpu.

Mirrors the error surface of the reference's WGAError enum
(reference: src/errors.rs:8-86) with Python exceptions.
"""


class WGAError(Exception):
    """Base error for all wgatools-tpu failures."""


class FileNotExist(WGAError):
    def __init__(self, path):
        super().__init__(f"File path `{path}` not exist")
        self.path = path


class FileReWrite(WGAError):
    def __init__(self, path):
        super().__init__(
            f"File `{path}` already exists, please add `-r` to rewrite it."
        )
        self.path = path


class ParseMafError(WGAError):
    def __init__(self, detail):
        super().__init__(f"Parse MAF error by: {detail}")


class ParseChainError(WGAError):
    def __init__(self, detail):
        super().__init__(f"Parse Chain error by: {detail}")


class ParsePafError(WGAError):
    def __init__(self, detail):
        super().__init__(f"Parse PAF error by: {detail}")


class ParseStrandError(WGAError):
    def __init__(self, s):
        super().__init__(f"Parse Strand `{s}` Error")


class ParseIntError(WGAError):
    def __init__(self, s):
        super().__init__(f"Parse `{s}` Into Integer Error")


class CigarTagNotFound(WGAError):
    def __init__(self):
        super().__init__("CIGAR start tag not found")


class CigarOpInvalid(WGAError):
    def __init__(self, op):
        super().__init__(f"CIGAR OP `{op}` invalid")


class InvalidBase(WGAError):
    def __init__(self, base):
        super().__init__(f"Invalid Base: `{base}`")


class EmptyStdin(WGAError):
    def __init__(self):
        super().__init__("Empty stdin, please add `-h` for help")


class EmptyRecord(WGAError):
    def __init__(self):
        super().__init__("Empty record")


class EmptyRegion(WGAError):
    def __init__(self):
        super().__init__("regions or region_file must be specified")


class StdinNotAllowed(WGAError):
    def __init__(self):
        super().__init__("Stdin not allowed here")


class StdoutNotAllowed(WGAError):
    def __init__(self):
        super().__init__("Stdout not allowed here")


class DuplicateName(WGAError):
    def __init__(self, name):
        super().__init__(
            f"Duplicate name `{name}` in a record not allowed, "
            "please check or use `rename`"
        )


class QueryNameNotFound(WGAError):
    def __init__(self, name):
        super().__init__(f"Query name:{name} not found in MAF")


class SLineCountNotMatch(WGAError):
    def __init__(self):
        super().__init__("S-line count not match")


class ParseGenomeRegionError(WGAError):
    def __init__(self, detail):
        super().__init__(f"Parse Genome Region Error By: {detail}")


class NotImplementedFeature(WGAError):
    def __init__(self):
        super().__init__("Ah-oh! NOT IMPLEMENTED :(")


class NotDirError(WGAError):
    def __init__(self, path):
        super().__init__(f"Path `{path}` is not a dir")
