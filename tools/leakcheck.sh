#!/usr/bin/env bash
# Reproducible generator for LEAKCHECK.json (see ADVICE round 8: the
# artifact must come from committed, re-runnable scans, not hand edits).
#
# Scans every tracked source/doc file for content that must never appear in
# a public, from-public-knowledge-only repo: non-public package imports,
# non-public URLs/hosts, cloud bucket URIs, chat links, credential-shaped
# strings, and unexpected environment-variable reads. Emits the same JSON
# shape the driver consumes: {round, n_hits, hits: {category: [..]}}.
#
# Usage: tools/leakcheck.sh <round-number> [repo-root]   (writes stdout)
set -euo pipefail
ROUND="${1:?usage: leakcheck.sh <round> [root]}"
ROOT="${2:-$(git -C "$(dirname "$0")/.." rev-parse --show-toplevel)}"
cd "$ROOT"

# Tracked text files only; generated/vendored trees are not scanned.
# ADVICE.md / VERDICT.md are driver-authored review artifacts (like the
# retrieved PAPERS/SNIPPETS), not repo-authored content — their prose may
# quote generic URI schemes the scanner pattern-matches.
FILES=$(git ls-files -- '*.scala' '*.sbt' '*.md' '*.sh' '*.py' '*.json' |
  grep -v -e '^SNIPPETS.md$' -e '^PAPERS.md$' -e '^LEAKCHECK.json$' \
    -e '^ADVICE.md$' -e '^VERDICT.md$' || true)

scan() { # scan <extended-regex> — prints file:line:match for tracked files
  [ -n "$FILES" ] && echo "$FILES" | xargs grep -nEH -e "$1" 2>/dev/null || true
}

json_array() { # newline-separated hits -> JSON string array
  python3 -c '
import json, sys
hits = [l for l in sys.stdin.read().split("\n") if l.strip()]
print(json.dumps(hits))'
}

# Domain-rooted imports outside the public allowlist (spark/scala/java/test
# libs/this repo). Relative imports (import spark.implicits._, import Dedup._)
# are not package references and are not flagged.
IMPORTS=$(scan '^[[:space:]]*import[[:space:]]+(com|org|net|io|ai|co|dev)\.' |
  grep -vE 'import[[:space:]]+(org\.apache\.spark|org\.apache\.derby|org\.scalatest|org\.scalacheck|org\.slf4j)' || true)
# URLs that are not apache/github/public-docs hosts.
URLS=$(scan 'https?://' |
  grep -vE '//(www\.)?(apache\.org|spark\.apache\.org|github\.com|raw\.githubusercontent\.com|duckdb\.org|arxiv\.org|dl\.acm\.org|doi\.org|en\.wikipedia\.org|mqtt\.org|eclipse\.org|json\.org|maven\.apache\.org|repo1\.maven\.org|scala-lang\.org|scala-sbt\.org|localhost|127\.0\.0\.1|example\.(com|org))' || true)
# Internal-looking package roots (com.<corp> / ai.<corp> style, not public).
PKG2=$(scan '(^|[^a-zA-Z])(com|ai|co)\.(anthropic|internal)[a-zA-Z0-9._]*' || true)
# Cloud storage URIs.
BUCKETS=$(scan '(s3a?|gs|abfss?|wasbs?)://' || true)
# Chat/ticket links.
SLACK=$(scan '(slack\.com|app\.slack|go/[a-z-]{2,})' || true)
# Credential-shaped strings.
KEYS=$(scan '(AKIA[0-9A-Z]{16}|sk-[A-Za-z0-9]{20,}|api[_-]?key[[:space:]]*[:=]|BEGIN [A-Z ]*PRIVATE KEY)' || true)
# Environment variables read by the code, outside the documented surface.
ENVV=$(scan 'sys\.env[^)]*' |
  grep -vE '(SPARK_GRAFT_[A-Z_]+|SPARK_DRIVER_MEM|COURSIER_MODE)' |
  grep -E 'sys\.env' || true)

N=0
for v in "$IMPORTS" "$URLS" "$PKG2" "$BUCKETS" "$SLACK" "$KEYS" "$ENVV"; do
  [ -n "$v" ] && N=$((N + $(echo "$v" | grep -c .)))
done

cat <<EOF
{
  "round": $ROUND,
  "n_hits": $N,
  "hits": {
    "internal-import": $(echo "$IMPORTS" | json_array),
    "internal-url": $(echo "$URLS" | json_array),
    "internal-pkg2": $(echo "$PKG2" | json_array),
    "internal-bucket": $(echo "$BUCKETS" | json_array),
    "slack-link": $(echo "$SLACK" | json_array),
    "api-key": $(echo "$KEYS" | json_array),
    "axon-env": $(echo "$ENVV" | json_array)
  }
}
EOF
