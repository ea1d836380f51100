"""Strand representation (reference: src/parser/common.rs:41-69)."""

from ..errors import ParseStrandError

POSITIVE = "+"
NEGATIVE = "-"


class Strand:
    """Lightweight +/- strand with the reference's parse/format rules."""

    POSITIVE = POSITIVE
    NEGATIVE = NEGATIVE

    @staticmethod
    def parse(s: str) -> str:
        if s == "+":
            return POSITIVE
        if s == "-":
            return NEGATIVE
        raise ParseStrandError(s)

    @staticmethod
    def is_negative(s: str) -> bool:
        return s == NEGATIVE
