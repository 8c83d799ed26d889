"""Sources: synthetic fixture generation, filesystem crawling, catalogs."""
