#!/usr/bin/env bash
# Reinstall the repo's git hooks. .git/hooks is not versioned and a
# fresh clone (the driver re-clones between rounds) silently drops the
# CHANGES-narrative pre-commit gate — run this once per round/clone.
set -euo pipefail
cd "$(dirname "$0")/.."
cat > .git/hooks/pre-commit <<'EOF'
#!/usr/bin/env bash
exec bash "$(git rev-parse --show-toplevel)/scripts/check_changes.sh"
EOF
chmod +x .git/hooks/pre-commit
echo "pre-commit hook installed (CHANGES gate: scripts/check_changes.sh)"
