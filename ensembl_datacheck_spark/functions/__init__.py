"""JVM-first column functions plus the vectorized pandas/Arrow UDF tier
(input_hint: no per-row Python anywhere)."""
