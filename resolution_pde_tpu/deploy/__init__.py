"""Deployment layer: AOT-compiled serving on resolution buckets."""

from resolution_pde_tpu.deploy.serving import ServingEngine

__all__ = ["ServingEngine"]
