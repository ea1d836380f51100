"""Number formatting helpers matching Rust's output.

The reference serializes f32 statistics through the csv crate and f64
plot data through csv/serde_json; both format floats with ryu's "pretty"
notation (ryu/src/pretty/mod.rs): shortest round-trip digits, positional
iff -5 < kk <= 16 for f64 (13 for f32) where 10^(kk-1) <= |v| < 10^kk,
otherwise `d.ddde<exp>` with no '+' and no zero-padded exponent.
numpy's unique=True (Dragon4 shortest) produces the same digit strings;
we only rebuild the notation around them.

(Chain headers use Rust `{}` Display instead, which never uses exponent
notation -- that lives in io/chain.py:fmt_f64.)
"""

import json
import math

import numpy as np


def _ryu_pretty(f, upper_kk: int) -> str:
    """Rebuild ryu::Buffer::format notation from numpy's shortest digits.

    `f` is a numpy float32/float64 scalar; `upper_kk` is 13 for f32 and
    16 for f64 (ryu pretty/mod.rs: `kk <= 13` / `kk <= 16`).
    """
    v = float(f)
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "inf" if v > 0 else "-inf"
    neg = math.copysign(1.0, v) < 0
    if v == 0.0:
        return "-0.0" if neg else "0.0"
    # shortest digits + decimal exponent from the scientific form
    sci = np.format_float_scientific(f, unique=True)
    mant, _, exp = sci.partition("e")
    digits = mant.lstrip("-").replace(".", "").rstrip("0") or "0"
    kk = int(exp) + 1  # 10^(kk-1) <= |v| < 10^kk
    if -5 < kk <= upper_kk:
        if kk <= 0:
            out = "0." + "0" * (-kk) + digits
        elif kk >= len(digits):
            out = digits + "0" * (kk - len(digits)) + ".0"
        else:
            out = digits[:kk] + "." + digits[kk:]
    else:
        out = digits[0] + ("." + digits[1:] if len(digits) > 1 else "")
        out += "e" + str(kk - 1)
    return "-" + out if neg else out


def fmt_f32(v) -> str:
    """ryu pretty for f32 (csv crate float serialization)."""
    return _ryu_pretty(np.float32(v), 13)


def fmt_f64_ryu(v) -> str:
    """ryu pretty for f64 (csv crate + serde_json float serialization)."""
    return _ryu_pretty(np.float64(v), 16)


class RawJson:
    """Pre-serialized JSON fragment spliced verbatim by dumps_serde (lets
    native row formatters feed the dotplot spec without re-parsing)."""

    __slots__ = ("text",)

    def __init__(self, text: str):
        self.text = text


def dumps_serde(obj) -> str:
    """Compact serde_json-compatible dump: sorted keys (serde_json's
    default BTreeMap ordering for `json!` maps), ryu pretty floats
    (non-finite -> null, serde_json ser/mod.rs write_f64), raw UTF-8
    (serde_json never \\u-escapes non-ASCII)."""
    out = []
    _dump(obj, out)
    return "".join(out)


def _dump(o, out):
    if isinstance(o, RawJson):
        out.append(o.text)
    elif o is True:
        out.append("true")
    elif o is False:
        out.append("false")
    elif o is None:
        out.append("null")
    elif isinstance(o, str):
        out.append(json.dumps(o, ensure_ascii=False))
    elif isinstance(o, float):
        out.append(fmt_f64_ryu(o) if math.isfinite(o) else "null")
    elif isinstance(o, int):
        out.append(str(o))
    elif isinstance(o, dict):
        out.append("{")
        for i, k in enumerate(sorted(o)):
            if i:
                out.append(",")
            out.append(json.dumps(str(k), ensure_ascii=False))
            out.append(":")
            _dump(o[k], out)
        out.append("}")
    elif isinstance(o, (list, tuple)):
        out.append("[")
        for i, x in enumerate(o):
            if i:
                out.append(",")
            _dump(x, out)
        out.append("]")
    else:
        raise TypeError(f"not JSON-serializable: {type(o)!r}")
