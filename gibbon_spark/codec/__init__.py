"""Optional Gorilla byte-parity codec (SURVEY.md M5)."""
