"""Extract Snowball among DATA tables from a generated stemmer source.

The among tables are the published snowballstem.org algorithms' suffix
data (the same data every Snowball port compiles in); this tool parses
them out of a generated Tartarus stemmer file and prints Python lists in
the snowball_data.py convention: (suffix, code) pairs sorted
longest-first so a linear endswith scan reproduces the among trie's
longest-match + limit-fallback semantics. Entries carrying an
among-context method are printed as (suffix, code, 'METHODNAME') triples
for drivers that need condition-during-match behavior.

Usage: python tools/extract_amongs.py <Stemmer.cs> <PREFIX>
"""

import re
import sys


def parse(path: str):
    src = open(path, encoding="utf-8").read()
    tables = {}
    for m in re.finditer(
        r"Among\[\]\s+(a_\d+)\s*=\s*\{(.*?)\};", src, re.S
    ):
        name, body = m.group(1), m.group(2)
        rows = []
        for e in re.finditer(
            r'new Among\s*\(\s*"((?:[^"\\]|\\.)*)"\s*,\s*(-?\d+)\s*,\s*(-?\d+)'
            r"(?:\s*,\s*methodObject\.r_(\w+))?\s*\)",
            body,
        ):
            suffix = e.group(1).encode().decode("unicode_escape")
            code = int(e.group(3))
            cond = e.group(4)
            rows.append((suffix, code, cond))
        tables[name] = rows
    return tables


def main():
    path, prefix = sys.argv[1], sys.argv[2]
    for name, rows in parse(path).items():
        out = sorted(rows, key=lambda r: -len(r[0]))
        pyname = f"{prefix}_{name.upper()}"
        print(f"{pyname} = [")
        for suffix, code, cond in out:
            if cond:
                print(f"    ({suffix!r}, {code}, {cond!r}),")
            else:
                print(f"    ({suffix!r}, {code}),")
        print("]\n")


if __name__ == "__main__":
    main()
