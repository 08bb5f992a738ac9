"""Extract RSLP step DATA from a published .rslp rules file.

The .rslp files are the published RSLP algorithm's rule data (Orengo &
Huyck, "A stemming algorithm for the Portuguese language", SPIRE 2001;
the Galician adaptation by the BVG project). This tool re-renders them
as Python tuples in the repo's data-module convention:

    PREFIX_STEPS = {
      name: (min, type, (cond-suffixes...), (
          (suffix, minlen, replacement, (exceptions...)),
      ...))
    }

Usage: python tools/extract_rslp.py <file.rslp> <PREFIX>
"""

import re
import sys

_HEADER = re.compile(r'^\{\s*"([^"]*)",\s*(\d+),\s*(0|1),\s*\{(.*)\},\s*$')
_STRIP = re.compile(r'^\{\s*"([^"]*)",\s*(\d+)\s*\}\s*(,|(\}\s*;))$')
_REP = re.compile(r'^\{\s*"([^"]*)",\s*(\d+),\s*"([^"]*)"\}\s*(,|(\}\s*;))$')
_EXC = re.compile(
    r'^\{\s*"([^"]*)",\s*(\d+),\s*"([^"]*)",\s*\{(.*)\}\s*\}\s*(,|(\}\s*;))$'
)


def _list(s: str):
    s = s.strip()
    if not s:
        return ()
    return tuple(x.strip().strip('"') for x in s.split(","))


def parse(path: str):
    steps = {}
    cur = None
    for raw in open(path, encoding="utf-8"):
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        m = _HEADER.match(line)
        if m:
            cur = (int(m.group(2)), int(m.group(3)), _list(m.group(4)), [])
            steps[m.group(1)] = cur
            continue
        m = _STRIP.match(line)
        if m:
            cur[3].append((m.group(1), int(m.group(2)), "", ()))
        else:
            m = _REP.match(line)
            if m:
                cur[3].append((m.group(1), int(m.group(2)), m.group(3), ()))
            else:
                m = _EXC.match(line)
                if m:
                    cur[3].append(
                        (m.group(1), int(m.group(2)), m.group(3),
                         _list(m.group(4)))
                    )
                else:
                    raise ValueError(f"unparsed rule line: {line!r}")
    return steps


def main():
    path, prefix = sys.argv[1], sys.argv[2]
    steps = parse(path)
    print(f"{prefix}_STEPS = {{")
    for name, (mn, typ, sufs, rules) in steps.items():
        print(f"    {name!r}: ({mn}, {typ}, {sufs!r}, (")
        for r in rules:
            print(f"        {r!r},")
        print("    )),")
    print("}")


if __name__ == "__main__":
    main()
