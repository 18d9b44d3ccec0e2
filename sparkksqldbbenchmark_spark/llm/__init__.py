"""Large-scale training-data-pipeline operators (the north-star extension
surface, BASELINE.json): deduplication, similarity search, text analysis,
multimodal columns. All Spark-side logic is built-in expressions (JVM,
whole-stage codegen) except the explicitly-Pandas multimodal decode path.
"""
