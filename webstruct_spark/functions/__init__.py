"""Pure-Column feature expressions and text-analysis functions —
JVM-side (whole-stage-codegen'd) wherever the semantics allow; the
language-ID heuristic is the lone Arrow UDF here.
"""
