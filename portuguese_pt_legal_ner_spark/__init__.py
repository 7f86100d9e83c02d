"""portuguese_pt_legal_ner_spark — a from-scratch PySpark-native
knowledge-graph construction engine.

Re-expresses the inference dataflow of the reference repo
(EduardoPamplona/portuguese-PT_legal_NER, /root/reference) — Portuguese
legal NER with BIO decoding (`src/inference.py`) — as a distributed,
Arrow-vectorized Spark pipeline, and extends it with the KG stages the
north-star mandates: triple lifting, entity linking (broadcast alias
dict + MinHash-LSH blocking), canonicalization via connected
components, and Iceberg/parquet graph materialization, plus the
training-data-pipeline operators (dedup, similarity search, text
analysis) a 100 TB corpus needs.

Layout:
  labels.py        19-label BIO space (reference src/data.py:27-50)
  tokenization.py  deterministic word tokenizer w/ char offsets
  mock_model.py    deterministic rule-based token classifier (sandbox
                   stand-in for a BERTimbau checkpoint)
  decode.py        HF aggregation_strategy="simple"-compatible BIO
                   span decode (reference src/inference.py:86-94)
  reference_path.py serial faithful reimplementation of the reference
                   inference loop (the parity oracle)
  synth.py         seeded synthetic transcripts + alias dictionary
  session.py       tuned SparkSession builders
  operators/       Spark-side operators (mentions, triples, linking,
                   canonicalize, graph, dedup, similarity, textstats,
                   metrics, multimodal)
  sources/         scans (parquet tables, CoNLL fixtures)
  plans/           end-to-end pipeline orchestration + checkpoints
  streaming/       incremental/streaming seams
"""

__version__ = "0.1.0"
