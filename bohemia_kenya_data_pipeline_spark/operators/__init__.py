"""Composable DataFrame->DataFrame operators (SURVEY §2)."""
