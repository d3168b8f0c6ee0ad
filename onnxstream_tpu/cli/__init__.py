"""Command-line applications: sd (Stable Diffusion) and llm (chat)."""
