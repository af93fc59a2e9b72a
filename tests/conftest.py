"""Shared fixtures: one local SparkSession + the planted-secret corpus.

The corpus mirrors the invariants of the reference fixtures
(tests/resources/source_text.txt, tests/resources/local_server/index.html):
every loaded rule must match at least once (test_handler.py:25-30), the
HTML page exercises a/link/script extraction, static pruning, sanitizer
rejects and dangerous paths.
"""

from __future__ import annotations

import os

import pytest

from secretscraper_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # SPARK_GRAFT_TEST_MASTER lets submit/run_tests.sh re-run the whole
    # suite under spark-submit at two parallelism levels (the BASELINE.json
    # correctness-gate launch shape); plain pytest uses local[4]
    master = os.environ.get("SPARK_GRAFT_TEST_MASTER", "local[4]")
    shuffle = int(os.environ.get("SPARK_GRAFT_TEST_SHUFFLE", "4"))
    s = get_spark("tests", master=master, shuffle_partitions=shuffle)
    yield s
    s.stop()


# one planted exemplar per loaded rule (FIXTURES.md §3), lorem filler our own
PLANTED_TEXT = """Pellentesque habitant morbi tristique senectus netus.
sourcemap hint: /xx/static/asdfaf.js.map
swagger endpoint: /static/swagger-ui.html
identity: 130528200011110000
mobile: "13273487666"
redirect value: /login?redirect=http://xxxx)
mail: "3333333qqqxxxx@qq.com"
intranet: 10.0.0.1
cloud: Accesskeyid=xxxx AccessKeySecret
session: xxx=deleteme rememberme=true
token: '9c65a3ebabdb448b4476b114ee574a6f'
bearer: "eyJhbGciOiJIUzI1NiJ9.eyJzdWIiOiIxMjM0NTY3ODkwIn0"
Vivamus malesuada nisl urna, in interdum dui tempus ac.
"""

HTML_TEXT = """<!DOCTYPE html>
<html>
<head><title>Fixture Page</title></head>
<body>
<a href="/p/child1">one</a>
<a href="http://other.test/abs">two</a>
<link href="normal"/>
<link href="delete"/>
<script src="1.js"></script>
<script src="notjs.txt"></script>
<img src="favicon.ico"/>
<a href="x.png">static</a>
<a href="javascript:void(0)">garbage</a>
<a href="http://example.com/x">garbage2</a>
<script>
var u = "https://regex.test/from-regex";
var j = "/assets/app.js";
</script>
</body>
</html>
"""


@pytest.fixture()
def planted_text() -> str:
    return PLANTED_TEXT


@pytest.fixture()
def html_text() -> str:
    return HTML_TEXT
