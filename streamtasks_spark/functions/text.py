"""Text scalar operators (reference: stringmatcher / numbertotext /
textformatter — system/tasks/*.py). All JVM-side Column expressions."""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def string_matcher(
    value: Column,
    pattern: str,
    *,
    regex: bool = True,
    flags: str = "",
) -> Column:
    """StringMatcher (reference system/tasks/stringmatcher.py:21-44):
    TextMessage → 1.0/0.0 on (partial) regex match. Non-regex mode matches
    the escaped literal as a substring. Flags i/m/s map to inline groups."""
    pat = pattern if regex else re.escape(pattern)
    inline = "".join(c for c in flags if c in "ims")
    if inline:
        pat = f"(?{inline}){pat}"
    # rlike is a partial (search-style) match, same as python re.search
    return F.when(value.rlike(pat), F.lit(1.0)).otherwise(F.lit(0.0))


def number_to_text(value: Column) -> Column:
    """NumberToText (reference system/tasks/numbertotext.py:17-34)."""
    return value.cast("string")


def text_format(template: str, variables: dict[str, Column]) -> Column:
    """TextFormatter (reference system/tasks/textformatter.py:28-75):
    ``template.format_map(vars)`` with {name} placeholders. Compiled to a
    concat of literals and columns — stays in codegen."""
    parts: list[Column] = []
    pos = 0
    for m in re.finditer(r"\{([A-Za-z_][A-Za-z0-9_]*)\}", template):
        if m.start() > pos:
            parts.append(F.lit(template[pos : m.start()]))
        name = m.group(1)
        if name not in variables:
            raise KeyError(f"text_format: unbound variable {name!r}")
        parts.append(variables[name].cast("string"))
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    if not parts:
        return F.lit("")
    return F.concat(*parts)
