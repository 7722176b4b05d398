"""Ingestion sources -> bronze landing layer."""
