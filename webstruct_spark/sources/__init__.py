"""Deterministic synthetic sources (seed-fixed, no wall clock, no
external data) for the transcript KG pipeline, plus loaders.

``transcripts.py`` synthesizes the input table of the BASELINE.json
input_hint shape — (conv_id:string, turn_idx:int, role:string,
text:string, tool:string, ts:timestamp) — with inline
`` __START_X__ … __END_X__ `` ground-truth markers in ``text`` (the
reference loader output format, /root/reference/webstruct/loaders.py:96-97)
plus the gazetteer/alias table and *generation-time* gold mentions
(independent of the extraction kernels, so the driver oracle check is
a real end-to-end gate).
"""
