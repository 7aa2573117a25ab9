"""Operator surface: relational built-ins, dedup, similarity, multimodal.

Every public function here returns a DataFrame (a logical plan), never a
collected result — operators compose and Catalyst optimizes the composition.
"""
