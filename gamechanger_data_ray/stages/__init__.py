"""Composable Dataset stages: text analysis, dedup, similarity, multimodal."""
