#!/usr/bin/env python3
"""One-shot r14 migration: move giant pinned-VALUES string vals out of
main Scala source into classpath resource files loaded by
graft.queries.Pins.resource.

Finds `private val <name>: String =` whose body is exactly one of

    \"\"\"...\"\"\".stripMargin.replace("\n", " ")
    Seq(\"\"\"...\"\"\".stripMargin, ...).mkString(" ").replace("\n", " ")

(the two shapes tools/pingen.py emits), with > MIN_LINES literal lines.
The processed value of both shapes is provably `lines.mkString(" ")`
over the margin-stripped literal lines (the Seq separator " " equals
the newline replacement), so the resource file stores one literal line
per line and the loader joins with " " — byte-identical by
construction. Verify with tools/DumpOracles before/after.
"""
import os
import re
import sys

MIN_LINES = 50
FILES = [
    "src/main/scala/graft/queries/CurationQueries.scala",
    "src/main/scala/graft/queries/TextQueries.scala",
    "src/main/scala/graft/queries/VectorQueries.scala",
    "src/main/scala/graft/queries/GeoQueries.scala",
    "src/main/scala/graft/queries/BronzeQueries.scala",
]
RES_DIR = "src/main/resources/graft/pins"

VAL_RE = re.compile(r"^(\s*)private val (\w+): String =\s*$")
SINGLE_END = '""".stripMargin.replace("\\n", " ")'
CHUNK_END = '""".stripMargin,'
SEQ_END = '""".stripMargin).mkString(" ").replace("\\n", " ")'
PLAIN_END = '""".stripMargin'


def snake(name):
    return re.sub(r"(?<!^)(?=[A-Z])", "_", name).lower()


def strip_margin_line(line):
    s = line.lstrip()
    if s.startswith("|"):
        return s[1:]
    return line  # scala stripMargin keeps non-| lines verbatim


def extract(lines, i):
    """Parse a val body starting at lines[i+1]. Returns
    (literal_lines, end_index_exclusive, mode) or None on ANY shape
    mismatch — a line containing triple quotes that is not a
    recognized terminator aborts the val (the r14 first-cut bug:
    running past a plain-stripMargin end swallowed neighboring vals).
    mode "space": value == lines joined by " " (the two pingen
    shapes); mode "newline": value == lines joined by "\\n" (plain
    `\"\"\".stripMargin`, newline-preserving)."""
    j = i + 1
    seq = False
    if lines[j].strip() == "Seq(":
        seq = True
        j += 1
    out = []
    if not lines[j].lstrip().startswith('"""'):
        return None
    first = lines[j].lstrip()[3:]
    if '"""' in first:
        return None
    cur = [first]
    j += 1
    while j < len(lines):
        raw = lines[j]
        stripped = raw.strip()

        def end_body():
            body = strip_margin_line(raw.rstrip())
            return body[: body.index('"""')]

        if '"""' in raw:
            if not seq and stripped.endswith(SINGLE_END):
                out.extend(cur + [end_body()])
                return out, j + 1, "space"
            if not seq and stripped.endswith(PLAIN_END):
                out.extend(cur + [end_body()])
                return out, j + 1, "newline"
            if seq and stripped.endswith(SEQ_END):
                out.extend(cur + [end_body()])
                return out, j + 1, "space"
            if seq and stripped.endswith(CHUNK_END):
                out.extend(cur + [end_body()])
                j += 1
                if j >= len(lines) or not lines[j].lstrip().startswith('"""'):
                    return None
                first = lines[j].lstrip()[3:]
                if '"""' in first:
                    return None
                cur = [first]
                j += 1
                continue
            return None
        cur.append(strip_margin_line(raw))
        j += 1
    return None


def main():
    os.makedirs(RES_DIR, exist_ok=True)
    total_moved = 0
    for path in FILES:
        with open(path) as f:
            lines = f.read().split("\n")
        out_lines = []
        i = 0
        moved = []
        while i < len(lines):
            m = VAL_RE.match(lines[i])
            if m:
                parsed = extract(lines, i)
                if parsed and len(parsed[0]) > MIN_LINES:
                    lits, end, mode = parsed
                    name = m.group(2)
                    res = snake(name) + ".txt"
                    loader = ("Pins.resource" if mode == "space"
                              else "Pins.resourceLines")
                    with open(os.path.join(RES_DIR, res), "w") as rf:
                        rf.write("\n".join(lits) + "\n")
                    out_lines.append(
                        f'{m.group(1)}private val {name}: String =')
                    out_lines.append(
                        f'{m.group(1)}  {loader}("{res}")')
                    moved.append((name, len(lits), res))
                    i = end
                    continue
            out_lines.append(lines[i])
            i += 1
        if moved:
            with open(path, "w") as f:
                f.write("\n".join(out_lines))
            for name, n, res in moved:
                print(f"{path}: {name} ({n} lines) -> {RES_DIR}/{res}")
            total_moved += len(moved)
    print(f"moved {total_moved} vals")


if __name__ == "__main__":
    main()
