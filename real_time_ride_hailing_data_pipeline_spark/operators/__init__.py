"""Operator library.

Each module holds pure DataFrame-in / DataFrame-out transforms, usable
identically on batch and streaming DataFrames wherever Structured
Streaming semantics allow (the Structured Streaming design point:
one declarative API, incrementalized by the engine).
"""
