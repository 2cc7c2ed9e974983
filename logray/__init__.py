"""logray — a Ray-Data-native parse → enrich → route → aggregate engine.

A from-scratch reimplementation of the capabilities of ``riptano/logparse``
(rule-based line→structured-record parsing: ordered ``switch``/``case``/
``rule`` dispatch with first-match-wins semantics, named-group ``capture``,
typed ``convert``, constant ``update``, ``default`` fall-through) rebuilt as
a vectorized Arrow-batch engine executed by Ray Data's streaming executor.

Layers (mirrors the reference's engine/config split — SURVEY.md §2):

- ``logray.ruleset``          — the generic vectorized rule-DSL engine (M0)
- ``logray.rules_transcripts``— the frozen normative ruleset (FIXTURES.md §2)
- ``logray.oracle``           — single-process pure-Python oracle parser
- ``logray.gen``              — deterministic transcript-corpus generator
- ``logray.sources``          — raw-text (.log/.log.gz) ingestion + envelope
- ``logray.compat``           — reference-call-shape parse_log(fileobj) generator
- ``logray.stages``           — Ray Data pipeline stages (parse/enrich/route)
- ``logray.pipelines``        — end-to-end DAGs (flagship pipeline, resume)
- ``logray.ops``              — relational + training-data ops (dedup,
  similarity, text, windows, sketches, multimodal)
- ``logray.functions``        — scalar/vector kernels shared across stages

The reference repo directory is empty in this sandbox (SURVEY.md §0); the
normative contract is BASELINE.json's north rule plus FIXTURES.md.
"""

__version__ = "0.1.0"
