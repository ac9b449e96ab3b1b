"""Model-backed backends (LLM/MLLM) for the UDF seams; offline-safe."""
