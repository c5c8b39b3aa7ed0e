#!/usr/bin/env python3
"""Split graft.Explain output into per-query plan files.

Usage: split_explain.py <explain_output.txt> <outdir> <suffix>
Writes <outdir>/<query>_<suffix>.txt for each '===== name =====' section.
"""
import sys, os, re

src, outdir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
os.makedirs(outdir, exist_ok=True)
name, buf = None, []
def flush():
    if name and buf:
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write("\n".join(buf).rstrip() + "\n")
for line in open(src, errors="replace"):
    line = line.rstrip("\n")
    m = re.match(r"^===== (\S+) =====$", line)
    if m:
        flush(); name = m.group(1); buf = []
    elif name is not None:
        buf.append(line)
flush()
print("wrote sections to", outdir)
