"""Text feature re-extraction entry (reference: preprocess_text.py →
preprocess/lexical/extractor.py main).

    python preprocess_text.py --dataset=iemocap-cogmen-4 --mode=sbert \
        [--model_path=/path/to/local/model] [--out=/path/out.pkl]
"""

from erc_tpu.core.params import BaseParams
from erc_tpu.preprocess.lexical import extract_text_features


def main():
    p = BaseParams()
    p.dataset = "iemocap-cogmen-4"
    p.mode = p.choice("sbert", "robert")
    p.model_path = None
    p.out = None
    p.finalize()
    path = extract_text_features(p.dataset, p.mode, p.get("model_path"), p.get("out"))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
