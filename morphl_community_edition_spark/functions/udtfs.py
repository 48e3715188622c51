"""UDTF surface (J4): Python user-defined table functions (Spark 3.5+).

Kept deliberately small — UDTFs are row-at-a-time Python (no Arrow
batching), so the engine only reaches for them where a lateral
one-row→many-rows expansion can't be expressed as explode() over a
built-in (which covers almost everything; q29 uses explode, not this).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos: int, shingle: string")
class ShingleUDTF:
    """lateral shingle expansion: (text, n) → (pos, n-word shingle)."""

    def eval(self, text: str, n: int):  # noqa: D102
        if text is None:
            return  # NULL text expands to zero shingles, like the
            # explode twin — not a worker AttributeError (r9 review)
        words = text.split(" ")
        for i in range(max(len(words) - n + 1, 0)):
            yield i, " ".join(words[i : i + n])
