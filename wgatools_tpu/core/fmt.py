"""Number formatting helpers matching Rust's output.

The reference serializes f32 statistics through the csv crate, which uses
ryu (shortest decimal that round-trips the f32).  numpy's
format_float_positional(unique=True) produces the same digits; we only need
to fix up the trailing '.' and non-finite spellings.
"""

import math

import numpy as np


def fmt_f32(v) -> str:
    f = np.float32(v)
    if math.isnan(float(f)):
        return "NaN"
    if math.isinf(float(f)):
        return "inf" if f > 0 else "-inf"
    s = np.format_float_positional(f, unique=True)
    if s.endswith("."):
        s += "0"
    if s.startswith("."):
        s = "0" + s
    if s.startswith("-."):
        s = "-0" + s[1:]
    return s
