#!/bin/bash
# Download the published BioM3 checkpoints + tower weights, then convert
# them to this framework's native layout and run the parity gates.
#
# Sources (mirrors the reference's distribution story —
# /root/reference/weights/*/README.md): the three BioM3 .bin state dicts
# from Google Drive (gdown ids below), fair-esm ESM2-650M from FAIR's
# public bucket, and PubMedBERT from the HF hub.  Zero-egress sandboxes
# can't run this; on a connected machine it is the one-command setup.
#
# Usage: tools/fetch_weights.sh [dest_dir]   (default ./weights)
set -euo pipefail
DEST="${1:-weights}"
mkdir -p "$DEST"
cd "$DEST"

command -v gdown >/dev/null || pip install gdown

# Stage checkpoints (reference weights/{PenCL,Facilitator,ProteoScribe}/README.md)
[ -f BioM3_PenCL_epoch20.bin ] || \
    gdown --id 1Lup7Xqwa1NjJpoM2uvvBAdghoM-fecEj -O BioM3_PenCL_epoch20.bin
[ -f BioM3_Facilitator_epoch20.bin ] || \
    gdown --id 1_YWwILXDkx9MSoSA1kfS-y0jk3Vy4HJE -O BioM3_Facilitator_epoch20.bin
[ -f BioM3_ProteoScribe_pfam_epoch20_v1.bin ] || \
    gdown --id 1c3CwvbOP_kp3FpLL1wPrjO6qtY-XiT26 -O BioM3_ProteoScribe_pfam_epoch20_v1.bin

# Tower weights (reference weights/LLMs/README.md)
[ -f esm2_t33_650M_UR50D.pt ] || \
    wget -q https://dl.fbaipublicfiles.com/fair-esm/models/esm2_t33_650M_UR50D.pt
[ -f esm2_t33_650M_UR50D-contact-regression.pt ] || \
    wget -q https://dl.fbaipublicfiles.com/fair-esm/regression/esm2_t33_650M_UR50D-contact-regression.pt
python - <<'EOF'
from transformers import AutoModelForMaskedLM, AutoTokenizer
name = "microsoft/BiomedNLP-PubMedBERT-base-uncased-abstract"
AutoModelForMaskedLM.from_pretrained(name).save_pretrained("pubmedbert")
AutoTokenizer.from_pretrained(name).save_pretrained("pubmedbert")
EOF

echo "fetched. Now run the parity gates against the README expected values:"
echo "  python tools/parity_check.py \\"
echo "      --pencl $PWD/BioM3_PenCL_epoch20.bin \\"
echo "      --facilitator $PWD/BioM3_Facilitator_epoch20.bin"
