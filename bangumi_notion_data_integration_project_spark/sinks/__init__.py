"""Connectors out (SURVEY §2.8): CSV, Excel, JDBC, row-wise REST."""
