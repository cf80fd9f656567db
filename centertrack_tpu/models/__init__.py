"""Model zoo: backbones, necks, heads (reference: src/lib/model/networks/)."""
