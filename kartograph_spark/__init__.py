"""kartograph_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch rebuild of the capabilities of jsell-rh/kartograph
(reference read-only at /root/reference) as an idiomatic Spark pipeline
over tables of multi-turn conversation/agent transcripts
``(conv_id, turn_idx, role, text, tool, ts)``:

  scan -> stable (conv_id, turn_idx) window ordering
       -> vectorized mention detection (Arrow/pandas UDFs, no per-row Python)
       -> (subj, pred, obj) triple emission
       -> entity linking (blocking keys + broadcast join vs alias dictionary)
       -> connected-components canonicalization of coreferent entities
       -> validation (broken refs / orphans, anti/semi joins)
       -> partitioned graph_nodes / graph_edges materialization
       -> per-partition lineage + metrics, idempotent resume.

Architecture is Spark-first (DataFrame/Catalyst/AQE); nothing is a port of
the reference's Python orchestration.  Semantics parity targets are cited
per-module as reference file:line.
"""

__version__ = "0.1.0"
