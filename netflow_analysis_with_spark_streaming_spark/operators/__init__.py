"""Batch operators. Each module exposes pure DataFrame -> DataFrame
functions so the driver's oracle harness and unit tests compose them
freely."""
