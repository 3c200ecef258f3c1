"""Sources & sinks: deterministic fixture generation (pages/seeds/robots/
hosts), parquet table IO, and the atomic manifest (checkpoint) layer.
"""
