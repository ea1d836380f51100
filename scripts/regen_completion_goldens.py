"""Regenerate tests/golden/completion.{bash,zsh,fish} after CLI changes."""

import io
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from wgatools_tpu.tools.completion import gen_completion  # noqa: E402

golden = pathlib.Path(__file__).resolve().parents[1] / "tests" / "golden"
for shell in ("bash", "zsh", "fish"):
    buf = io.BytesIO()
    gen_completion(shell, buf)
    (golden / f"completion.{shell}").write_bytes(buf.getvalue())
    print(f"wrote completion.{shell} ({len(buf.getvalue())} bytes)")
