"""Stable Diffusion family: UNet, VAE decoder, CLIP text encoders, pipeline."""
