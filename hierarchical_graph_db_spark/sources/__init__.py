"""Source connectors: maildir/RFC822 ingest (reference S1-S5), streaming
landing-dir sources, and multimodal binary ingestion."""
