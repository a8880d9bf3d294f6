"""Shared helper for the structural lint family.

The lints scan source lines for patterns (collect_list, broadcast,
repartition, ...) and must discount commented-out code without
discounting code that merely CONTAINS a '#' inside a string literal —
``line.split('#', 1)[0]`` truncates ``F.expr("... '#' ... collect_list(x)")``
and lets the buffer dodge the census (ADVICE r13).  ``strip_comment``
walks the line tracking quote state and truncates only at a '#' that is
provably outside quotes.

``strip_comment`` is line-at-a-time and does NOT know about
triple-quoted strings opened on an earlier line: a '#' on a
continuation line of a multi-line string is treated as a comment start
and the rest of THAT line is dropped — an UNDER-scan (ADVICE r14
corrected the old docstring, which claimed the opposite), so a census
pattern after a literal '#' inside a multi-line SQL string could dodge
a per-line scan.  File scanners must therefore use
``strip_comment_lines``, which carries triple-quote state across lines
and never treats a '#' inside an open string as a comment.
"""


def strip_comment(line: str) -> str:
    """Return ``line`` truncated at the first '#' outside string quotes.

    Single-line only — see the module docstring for the multi-line
    caveat; file scans use :func:`strip_comment_lines` instead."""
    return _strip_one(line, None)[0]


def strip_comment_lines(lines: list[str]) -> list[str]:
    """Comment-strip a whole file's lines, carrying triple-quote state
    across lines so a '#' inside a multi-line string literal is never
    treated as a comment start (the under-scan ADVICE r14 named).
    Returns one output line per input line, same order."""
    out = []
    triple = None  # open triple-quote delimiter carried from prior lines
    for line in lines:
        stripped, triple = _strip_one(line, triple)
        out.append(stripped)
    return out


def _strip_one(line: str, open_triple):
    """Strip one line given the triple-quote delimiter open at its start
    (or None).  Returns (stripped_line, triple open at its end)."""
    quote = open_triple  # None, "'", '"', "'''" or '\"\"\"'
    i, n = 0, len(line)
    while i < n:
        ch = line[i]
        if quote is not None:
            if ch == "\\":
                i += 2  # skip the escaped char (harmless past EOL)
                continue
            if line.startswith(quote, i):
                i += len(quote)
                quote = None
                continue
            i += 1
            continue
        if line.startswith("'''", i) or line.startswith('"""', i):
            quote = line[i : i + 3]
            i += 3
            continue
        if ch in ("'", '"'):
            quote = ch
            i += 1
            continue
        if ch == "#":
            return line[:i], None
        i += 1
    # At EOL a 1-char quote cannot legally continue (Python forbids bare
    # newlines in single-quoted strings), so only triple state carries.
    return line, quote if quote is not None and len(quote) == 3 else None
