"""Pure-Python/pandas kernel functions.

Every function here is deterministic and Spark-free so the same code
backs (a) the Arrow-vectorized pandas UDFs in the engine, (b) the
sequential oracle in tests/oracle.py, and (c) the fixture generator.
"""
