"""secretscraper_spark — PySpark-native re-expression of SecretScraper.

Version tracks the reference release whose semantics this engine
reproduces (reference ``src/secretscraper/__init__.py:3``).
"""

__version__ = "1.4.3"
