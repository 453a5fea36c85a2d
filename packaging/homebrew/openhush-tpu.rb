# Homebrew formula for openhush-tpu (macOS/Linux host; CPU backend by
# default — point JAX at an accelerator with `pip install 'jax[tpu]'`
# inside the created virtualenv).
class OpenhushTpu < Formula
  include Language::Python::Virtualenv

  desc "Local voice-to-text daemon on TPU (JAX/XLA/Pallas)"
  homepage "https://github.com/openhush/openhush-tpu"
  url "https://github.com/openhush/openhush-tpu/archive/refs/tags/v0.1.0.tar.gz"
  sha256 "0000000000000000000000000000000000000000000000000000000000000000"
  license "MIT"

  depends_on "python@3.11"

  def install
    virtualenv_install_with_resources
  end

  service do
    run [opt_bin/"openhush", "start", "--foreground"]
    keep_alive false
    log_path var/"log/openhush.log"
    error_log_path var/"log/openhush.log"
  end

  test do
    assert_match "openhush", shell_output("#{bin}/openhush --help")
  end
end
