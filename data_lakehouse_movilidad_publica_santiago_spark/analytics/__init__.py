"""Query corpora: the SURVEY §2 operator-inventory suite over the
driver testdata (``inventory``) and the reference's 15-query business
corpus over the gold constellation (``business``)."""
