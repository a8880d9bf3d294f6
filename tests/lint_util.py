"""Shared helper for the structural lint family.

The lints scan source lines for patterns (collect_list, broadcast,
repartition, ...) and must discount commented-out code without
discounting code that merely CONTAINS a '#' inside a string literal —
``line.split('#', 1)[0]`` truncates ``F.expr("... '#' ... collect_list(x)")``
and lets the buffer dodge the census (ADVICE r13).  ``strip_comment``
walks the line tracking quote state and truncates only at a '#' that is
provably outside quotes.

Line-based by design, like the scans that use it: a '#' on a
continuation line of a triple-quoted string opened on an earlier line
is treated as a comment start, which can only OVER-scan (the pattern is
then checked against more text, never less) — the fail-closed
direction for a census whose job is to catch sites.
"""


def strip_comment(line: str) -> str:
    """Return ``line`` truncated at the first '#' outside string quotes."""
    quote = None  # the active quote char, or None outside strings
    i, n = 0, len(line)
    while i < n:
        ch = line[i]
        if quote is not None:
            if ch == "\\":
                i += 2  # skip the escaped char (harmless past EOL)
                continue
            if ch == quote:
                quote = None
        elif ch in ("'", '"'):
            quote = ch
        elif ch == "#":
            return line[:i]
        i += 1
    return line
