"""Column-expression libraries (JVM-side, codegen-friendly — no Python
UDFs in any hot path)."""
