#!/usr/bin/env python3
"""One-shot sweep: round(X, 0) -> floor(X + 0.5) across oracle SQL strings.

Paren-matching (handles nested calls and multi-line string literals).
Only converts two-argument round(..., 0); single-arg Scala/SQL round is
handled by hand. Run once from the repo root, then delete or keep for audit.
"""
import re, sys, pathlib

def convert(text):
    out = []
    i = 0
    n = len(text)
    while i < n:
        m = re.compile(r'\bround\(').search(text, i)
        if not m:
            out.append(text[i:])
            break
        start, argstart = m.start(), m.end()
        depth = 1
        j = argstart
        top_comma = -1
        while j < n and depth > 0:
            c = text[j]
            if c == '(': depth += 1
            elif c == ')': depth -= 1
            elif c == ',' and depth == 1: top_comma = j
            j += 1
        inner = text[argstart:j-1]
        if top_comma >= 0 and text[top_comma+1:j-1].strip() == '0':
            arg = text[argstart:top_comma].rstrip()
            out.append(text[i:start])
            out.append('floor(' + arg + ' + 0.5)')
            i = j
        else:
            out.append(text[i:j])
            i = j
    return ''.join(out)

changed = 0
for p in pathlib.Path('src/main/scala/graft').rglob('*.scala'):
    t = p.read_text()
    c = convert(t)
    if c != t:
        p.write_text(c)
        changed += 1
        print('converted', p)
print('files changed:', changed)
