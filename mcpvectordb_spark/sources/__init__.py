"""Source connectors: local files/folders (binaryFile), URL fetch, and
multimodal binary-column plumbing."""
